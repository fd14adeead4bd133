"""Airflow orchestration example for the graft Spark jobs.

Wires the three spark-submit entry points in
``src/main/scala/graft/jobs/Mains.scala`` into the same three DAGs the
reference pipeline schedules (cadence, catchup, and date plumbing match
the reference exactly):

  ============================  ==========================  =========================================
  DAG (this file)               spark-submit class          reference DAG it mirrors
  ============================  ==========================  =========================================
  ``graft_ingest_clickstream``  ``graft.jobs.IngestMain``   airflow/dags/ingest_clickstream_to_s3.py
                                                            (``*/1 * * * *``, catchup=False,
                                                            max_active_runs=1 — lines 84-92)
  ``graft_daily_kpis``          ``graft.jobs.DailyKpisMain``  airflow/dags/daily_kpis.py
                                                            (``@daily``, catchup=True,
                                                            max_active_runs=16, 30-min timeout —
                                                            lines 181-195)
  ``graft_ingest_healthcheck``  ``graft.jobs.FreshnessMain``  airflow/dags/ingest_healthcheck.py
                                                            (``*/10 * * * *``, raise-on-stale —
                                                            lines 36-44)
  ============================  ==========================  =========================================

Date plumbing: Airflow's ``{{ ds }}`` template becomes the ``--date``
flag, which is the highest-precedence slot in ``RunDate.resolve`` (P11:
``--date`` > ``GRAFT_RUN_DATE`` > ``GRAFT_LOGICAL_DATE`` > today UTC) —
the same precedence the reference implements in
``daily_kpis._resolve_run_date`` (dag_run.conf > RUN_DATE env > logical
date > today). A manual trigger with ``{"run_date": "2025-09-03"}`` in
the dag_run conf therefore behaves identically: the template below
prefers ``dag_run.conf["run_date"]`` over ``ds``.

Backfill exactly like the reference::

    airflow dags backfill graft_daily_kpis -s 2025-09-01 -e 2025-09-14

(catchup=True + max_active_runs=16 gives 16 concurrent single-day
Spark jobs; each writes its own ``dt=<day>/`` partition, so runs are
independent and idempotent.)

Uses BashOperator + spark-submit rather than a Spark provider so the
example has no dependencies beyond core Airflow. Importable without
Airflow installed (same guard as the reference DAG files).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

# ---- Deployment configuration (env-overridable, like the reference's
# CLICKSTREAM_S3_BUCKET / KAFKA_BOOTSTRAP / INGEST_* knobs) ----
SPARK_SUBMIT = os.environ.get("GRAFT_SPARK_SUBMIT", "spark-submit")
GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft-assembly.jar")
SPARK_MASTER = os.environ.get("GRAFT_SPARK_MASTER", "local[32]")

# Zones: landing JSONL -> partitioned raw zone -> daily KPI parquet.
# s3a:// URIs work unchanged (graft.sources.S3AConf wires the committer).
LANDING_DIR = os.environ.get("GRAFT_LANDING_DIR", "s3a://clickstream/landing")
RAW_DIR = os.environ.get("GRAFT_RAW_DIR", "s3a://clickstream/raw/clickstream")
KPI_DIR = os.environ.get("GRAFT_KPI_DIR", "s3a://clickstream/kpis/daily")
CHECKPOINT_DIR = os.environ.get(
    "GRAFT_CHECKPOINT_DIR", "s3a://clickstream/checkpoints/ingest"
)

# Optional: set to a bootstrap string ("kafka:9092") to ingest from the
# Kafka topic instead of the landing directory (IngestMain --kafka).
KAFKA_BOOTSTRAP = os.environ.get("GRAFT_KAFKA_BOOTSTRAP", "")

# Freshness lookback, reference default 20 min (ingest_healthcheck.py:12).
LOOKBACK_MIN = os.environ.get("INGEST_HEALTH_LOOKBACK_MIN", "20")


def _submit(main_class: str, *app_args: str) -> str:
    """Build a spark-submit command line for one graft job."""
    args = " ".join(app_args)
    return (
        f"{SPARK_SUBMIT} --master {SPARK_MASTER} "
        f"--class {main_class} {GRAFT_JAR} {args}"
    )


# ``--date`` receives dag_run.conf["run_date"] when a manual trigger
# provides one, else the scheduler's {{ ds }} — reproducing the
# reference's conf-over-logical-date precedence at the template layer
# (RunDate.resolve applies the same ordering to the env slots).
RUN_DATE_TEMPLATE = (
    "{{ dag_run.conf.get('run_date', ds) if dag_run and dag_run.conf else ds }}"
)

INGEST_CMD = _submit(
    "graft.jobs.IngestMain",
    LANDING_DIR,
    RAW_DIR,
    CHECKPOINT_DIR,
    *(["--kafka", KAFKA_BOOTSTRAP] if KAFKA_BOOTSTRAP else []),
)

DAILY_KPIS_CMD = _submit(
    "graft.jobs.DailyKpisMain",
    RAW_DIR,
    KPI_DIR,
    "--date",
    f'"{RUN_DATE_TEMPLATE}"',
)

FRESHNESS_CMD = _submit(
    "graft.jobs.FreshnessMain",
    RAW_DIR,
    "--lookback-min",
    LOOKBACK_MIN,
)

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator

    # 1) Minutely bounded ingest: Trigger.AvailableNow drains whatever
    #    landed since the last checkpointed offset, then exits — the
    #    Spark-native equivalent of the reference's 600 s poll window
    #    (ingest_clickstream_to_s3.py:9-12). Exactly-once via the
    #    checkpoint, so max_active_runs=1 + catchup=False as upstream.
    with DAG(
        dag_id="graft_ingest_clickstream",
        default_args={"retries": 0},
        start_date=datetime(2025, 9, 1, tzinfo=timezone.utc),
        schedule_interval="*/1 * * * *",
        catchup=False,
        max_active_runs=1,
        tags=["clickstream", "ingest"],
    ) as ingest_dag:
        BashOperator(task_id="consume_and_upload", bash_command=INGEST_CMD)

    # 2) Daily KPIs with historical backfill: one independent Spark job
    #    per day, date injected via --date {{ ds }} (reference:
    #    daily_kpis.py:181-195).
    with DAG(
        dag_id="graft_daily_kpis",
        default_args={"retries": 0},
        start_date=datetime(2025, 9, 1, tzinfo=timezone.utc),
        schedule_interval="@daily",
        catchup=True,
        max_active_runs=16,
        concurrency=16,
        dagrun_timeout=timedelta(minutes=30),
        tags=["clickstream", "kpis"],
    ) as kpis_dag:
        BashOperator(task_id="compute_kpis", bash_command=DAILY_KPIS_CMD)

    # 3) 10-minute freshness monitor: FreshnessMain throws (non-zero
    #    exit -> task failure -> alerting) when no raw object under
    #    today's date= partition was modified within the lookback —
    #    the reference healthcheck's raise-on-stale contract
    #    (ingest_healthcheck.py:36-44).
    with DAG(
        dag_id="graft_ingest_healthcheck",
        default_args={"retries": 0},
        start_date=datetime(2025, 9, 1, tzinfo=timezone.utc),
        schedule_interval="*/10 * * * *",
        catchup=False,
        max_active_runs=1,
        tags=["clickstream", "health"],
    ) as health_dag:
        BashOperator(task_id="check_recent_raw", bash_command=FRESHNESS_CMD)

except ImportError:
    # Importable outside Airflow (e.g. for linting / command preview),
    # same guard as the reference DAG files.
    pass


if __name__ == "__main__":
    # Preview the three commands this example schedules.
    for name, cmd in [
        ("ingest  (*/1)", INGEST_CMD),
        ("kpis    (@daily, catchup)", DAILY_KPIS_CMD),
        ("health  (*/10)", FRESHNESS_CMD),
    ]:
        print(f"{name}:\n  {cmd}\n")
