package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many entities progress through a sequence
  * of event types IN ORDER (each later step strictly after the step
  * before it) — the conversion query behind every activation/retention
  * dashboard, and the reference's sessionization cousin (A2 pairs
  * start→end; a funnel chains n such "first X after T" steps).
  *
  * Implementation is staged aggregation, not a per-entity sorted scan:
  * step k's timestamp = min(event time where type = step_k AND time >
  * step_{k-1} time). Each step is one hash aggregation over the events
  * pre-filtered to that step's type, joined back on the entity — k narrow
  * shuffles for a k-step funnel, map-side partial aggs throughout, no
  * window sort, no per-entity state. At 100 TB the per-step shuffle
  * carries one row per entity, not one per event.
  *
  * Strictly-after semantics: equal timestamps do NOT advance the funnel
  * (a click logged in the same millisecond as the view it belongs to is
  * ambiguous — we take the conservative reading; the next strictly-later
  * occurrence still counts).
  */
object Funnel {

  /** Per-entity step times: `(entity, t_1, …, t_k)` with `t_i` = earliest
    * `steps(i-1)` event strictly after `t_{i-1}` (null when the entity
    * never completes step i). Entities absent from step 1 are absent from
    * the output.
    */
  def stepTimes(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      timeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val e = events.select(col(entityCol).as("entity"), col(typeCol).as("t"), col(timeCol).as("ts"))
    var acc = e.where(col("t") === steps.head)
      .groupBy(col("entity")).agg(min(col("ts")).as("t_1"))
    for (i <- 2 to steps.size) {
      val prev = s"t_${i - 1}"
      val step = e.where(col("t") === steps(i - 1))
      // No pre-filter on ts > prev: an entity whose step-i events are all
      // too early must still survive with t_i = null, and `when` already
      // feeds only qualifying times into the min (null prev ⇒ null ⇒ the
      // funnel cannot skip a step).
      acc = acc.join(step, Seq("entity"), "left")
        .groupBy((col("entity") +: (1 until i).map(j => col(s"t_$j"))): _*)
        .agg(min(when(col("ts") > col(prev), col("ts"))).as(s"t_$i"))
    }
    acc
  }

  /** Funnel summary: one row per step with the number of entities whose
    * ordered journey reached it. `n_entities` is non-increasing in
    * `step_idx` by construction.
    */
  def counts(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      timeCol: String,
      steps: Seq[String]): DataFrame = {
    val t = stepTimes(events, entityCol, typeCol, timeCol, steps)
    // One aggregation over the step-times table (counting every step in
    // the same pass), then a k-row unpivot — not k separate aggs that
    // would each recompute the whole chain.
    val cnts = steps.indices.map(i => count(col(s"t_${i + 1}")).as(s"n_${i + 1}"))
    t.agg(cnts.head, cnts.tail: _*)
      .select(posexplode(array(steps.indices.map(i => col(s"n_${i + 1}")): _*))
        .as(Seq("idx", "n_entities")))
      .select((col("idx") + 1).cast("long").as("step_idx"),
        element_at(typedlit(steps), col("idx").cast("int") + 1).as("step"),
        col("n_entities"))
  }

  /** UNORDERED set-completion funnel: per actor, how many of the target
    * steps were ever performed, whether the set completed, and the span
    * from the first step to the moment the LAST DISTINCT step first
    * appeared — the checklist/activation metric ("did they try all
    * three core features, and how long did adoption take") that an
    * order-sensitive funnel misreports whenever users wander.
    *
    * Scale shape: one (actor, step) min-ts agg (map-side combined, the
    * only full-data pass) then an actor-level agg — no windows, no
    * joins. Span is exact epoch-second arithmetic; incomplete actors
    * emit NULL span.
    */
  def setCompletion(
      df: DataFrame,
      actorCol: String,
      typeCol: Column,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, s"steps must be distinct: $steps")
    val firsts = df
      .where(typeCol.isin(steps: _*))
      .groupBy(col(actorCol), typeCol.as("__step"))
      .agg(min(expr(s"unix_millis(cast($tsCol as timestamp)) div 1000")).as("__t"))
    firsts.groupBy(col(actorCol))
      .agg(count(lit(1)).as("n_steps_seen"),
        max(col("__t")).as("__tLast"), min(col("__t")).as("__tFirst"))
      .withColumn("completed", col("n_steps_seen") === steps.size)
      .withColumn("span_seconds",
        when(col("completed"), col("__tLast") - col("__tFirst"))
          .otherwise(lit(null).cast("long")))
      .drop("__tLast", "__tFirst")
  }
}
