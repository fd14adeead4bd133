package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, lit, lower}

/** THE definition of the event-type predicates, shared by the batch
  * job (DailyKpis), the declared queries (KpiQueries) and the
  * streaming path (StreamingKpis) — one definition so the sets cannot
  * drift between codepaths again.
  *
  * Matches the reference's sets exactly (daily_kpis.py:124-127:
  * pageviews = page_view/pageview/view, purchases =
  * purchase/order/checkout; 'click' is NOT a pageview there, so it
  * isn't one here either), null-safely on the reference's
  * `str(x).lower()` coercion.
  */
object EventPredicates {
  def isPageview(c: Column): Column =
    lower(coalesce(c, lit(""))).isin("page_view", "pageview", "view")
  def isPurchase(c: Column): Column =
    lower(coalesce(c, lit(""))).isin("purchase", "order", "checkout")
}
