package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Property checks of the graft-events connector's partition planning
  * (SURVEY.md §5): for ANY (n, days) configuration the binary-searched
  * day boundaries must tile [0, n) exactly — no overlap, no gap, no
  * orphaned boundary row — and every partition's id range must agree
  * with its advertised [minTs, maxTs] day window under the SAME double
  * arithmetic the readers use. These are the invariants that make
  * day-partition pruning (planning-time and runtime) a pure
  * optimization: a row that could land outside its partition's ts
  * window would silently vanish under a pruned filter.
  */
object EventsPartitionProperties extends Properties("EventsPartitions") {

  private val genConf: Gen[EventsConf] = for {
    n <- Gen.oneOf(Gen.choose(1L, 100L), Gen.choose(1L, 500000L))
    days <- Gen.choose(1, 31)
    seed <- Gen.oneOf("graft", "alt", "x")
  } yield EventsConf(n, seed, "2025-09-01", days)

  private def partitions(conf: EventsConf): Array[EventsPartition] =
    new EventsScanBuilder(conf).build().asInstanceOf[EventsScan]
      .toBatch.planInputPartitions().map(_.asInstanceOf[EventsPartition])

  property("day partitions tile [0, n) exactly: no gap, no overlap") =
    Prop.forAll(genConf) { conf =>
      val ps = partitions(conf).sortBy(_.start)
      val tiles = ps.nonEmpty &&
        ps.head.start == 0L && ps.last.end == conf.n &&
        ps.sliding(2).forall {
          case Array(a, b) => a.end == b.start
          case _ => true
        } && ps.forall(p => p.start < p.end)
      tiles
    }

  property("every id's event_ts falls inside its partition's [minTs, maxTs]") =
    Prop.forAll(genConf) { conf =>
      partitions(conf).forall { p =>
        // boundary ids are the risk — interior ids follow by the
        // monotonicity of id -> ts
        Seq(p.start, p.end - 1, (p.start + p.end) / 2).forall { id =>
          val ts = EventsDataSource.fieldValue(conf, "event_ts", id).toString
          p.minTs <= ts && ts <= p.maxTs
        }
      }
    }

  property("pruning never drops a matching row: dropped partitions are all-below the bound") =
    Prop.forAll(genConf, Gen.choose(0, 30)) { (conf, dayIdx) =>
      val d = dayIdx % conf.days
      val lo = EventsDataSource
        .fieldValue(conf, "event_ts", (d.toLong * conf.n) / conf.days).toString
      val b = new EventsScanBuilder(conf)
      b.pushFilters(Array(
        org.apache.spark.sql.sources.GreaterThanOrEqual("event_ts", lo)))
      val kept = b.build().asInstanceOf[EventsScan]
        .toBatch.planInputPartitions()
        .map(_.asInstanceOf[EventsPartition]).map(p => (p.start, p.end)).toSet
      val dropped = partitions(conf)
        .filterNot(p => kept((p.start, p.end)))
      // every row of every dropped partition fails the filter — checked
      // on the LAST id, the largest ts the partition contains
      dropped.forall { p =>
        EventsDataSource.fieldValue(conf, "event_ts", p.end - 1).toString < lo
      }
    }

  property("grouped closed-form aggregate equals brute-force row-level recompute") =
    Prop.forAll(
      for {
        n <- Gen.oneOf(Gen.choose(0L, 50L), Gen.choose(1L, 20000L))
        days <- Gen.choose(1, 31)
        seed <- Gen.oneOf("graft", "alt")
      } yield EventsConf(n, seed, "2025-09-01", days)) { conf =>
      import org.apache.spark.sql.connector.expressions.Expressions
      import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
      val b = new EventsScanBuilder(conf)
      val agg = new Aggregation(
        Array(new CountStar(),
          new Min(Expressions.column("event_ts")),
          new Max(Expressions.column("event_ts"))),
        Array(Expressions.column("_day")))
      val pushed = b.pushAggregation(agg)
      // read the pushed scan's actual rows through its own reader
      val scan = b.build()
      val got = {
        val batch = scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
        val rf = batch.createReaderFactory()
        batch.planInputPartitions().flatMap { p =>
          val r = rf.createReader(p)
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String, String)]
          while (r.next()) {
            val row = r.get()
            buf += ((row.getInt(0), row.getLong(1),
              row.getUTF8String(2).toString, row.getUTF8String(3).toString))
          }
          buf
        }.sortBy(_._1).toSeq
      }
      // brute force over every id with the same wire functions
      val expect = (0L until conf.n).map { id =>
        (EventsDataSource.fieldValue(conf, "_day", id).asInstanceOf[Int],
          EventsDataSource.fieldValue(conf, "event_ts", id).toString)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, rows) =>
        (d, rows.size.toLong, rows.map(_._2).min, rows.map(_._2).max)
      }
      Prop(pushed && got == expect) :|
        s"pushed=$pushed got=${got.take(3)}... expect=${expect.take(3)}..."
    }
}
