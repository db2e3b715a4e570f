package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar radius self-join via fixed-grid blocking — the spatial
  * near-neighbor primitive (store↔store cannibalization, cell-tower
  * coverage overlap, co-located sensor pairing) without the all-pairs
  * cross join. Coordinates are INTEGERS in caller-chosen micro-units
  * (micro-degrees, millimeters — whatever makes the radius integral):
  * every distance comparison is exact 64-bit arithmetic, so results are
  * bit-identical across engines and partitionings.
  */
object GeoGrid {

  /** All unordered point pairs within `radius` (Euclidean, inclusive):
    * `(a_id, b_id, dist2)` with `a_id < b_id` and
    * `dist2 = (Δx)² + (Δy)² ≤ radius²`.
    *
    * Grid blocking: the plane is tiled into radius-sized square cells
    * (`⌊x/r⌋, ⌊y/r⌋`); any pair within `r` lies in the same or an
    * adjacent cell, so replicating each point into its 3×3 cell
    * neighborhood and equi-joining replicas against home cells finds
    * every qualifying pair — and finds it EXACTLY ONCE: the pair (a, b)
    * with `a_id < b_id` surfaces only where a's replica lands on b's
    * home cell (the mirrored match fails the id order).
    *
    * Scale shape: a 9× replication of narrow (id, x, y, cell) rows on
    * the LEFT side only, one equi-join on the cell key — shuffle cost
    * 10·n narrow rows, never n². Per-cell work is |cell|·|neighborhood|;
    * dense cells (urban cores) are the skew axis and land on distinct
    * reducer keys per cell, with AQE skew-split finishing the job. Cell
    * size IS the radius — the standard fixed-grid trade; much larger
    * radii with clustered data warrant a coarser quad-tree, finer radii
    * just shrink the cells.
    *
    * Overflow: |Δ| ≤ 2r pre-filter, so dist2 ≤ 8r² — exact for
    * r < 10⁹ micro-units.
    */
  def radiusPairs(
      points: DataFrame,
      idCol: String,
      xCol: Column,
      yCol: Column,
      radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1: $radius")
    val pts = points.select(
      col(idCol).cast("long").as("id"),
      xCol.cast("long").as("x"),
      yCol.cast("long").as("y"))
    // floor-div keeps negative coordinates on the correct cell (Spark's
    // long `div` truncates toward zero — wrong side of the origin).
    val home = pts
      .withColumn("__cx", floor(col("x").cast("double") / radius).cast("long"))
      .withColumn("__cy", floor(col("y").cast("double") / radius).cast("long"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val repl = home
      .withColumn("__o", explode(offsets))
      .select(col("id"), col("x"), col("y"),
        (col("__cx") + col("__o.dx")).as("__cx"),
        (col("__cy") + col("__o.dy")).as("__cy"))
    val dx = col("a.x") - col("b.x")
    val dy = col("a.y") - col("b.y")
    repl.alias("a")
      .join(home.alias("b"),
        col("a.__cx") === col("b.__cx") && col("a.__cy") === col("b.__cy") &&
          col("a.id") < col("b.id") &&
          dx * dx + dy * dy <= lit(radius * radius))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (dx * dx + dy * dy).as("dist2"))
  }
}
