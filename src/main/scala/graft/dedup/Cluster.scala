package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C1 — distributed connected components (engine.py:229-268's
  * union-find, re-expressed as an iterative DataFrame algorithm).
  *
  * Min-label propagation with pointer jumping: each iteration (a)
  * takes the min label over the 1-hop neighborhood, (b) shortcuts
  * `label := label(label)`. The shortcut gives the O(log n)-round
  * behavior of pointer-jumping CC algorithms (vs O(diameter) for
  * plain propagation — a chain graph would otherwise need n rounds).
  * Lineage is truncated with eager `localCheckpoint` every round, and
  * the driver-side loop converges when no label changes — the one
  * place control intentionally returns to the driver (SURVEY.md §3).
  */
object Cluster {

  /** @param edges undirected edges, columns (src: long, dst: long);
    *              either direction suffices.
    * @return (id: long, component: long) for every node appearing in
    *         an edge, with component = min node id in the component.
    *         Isolated nodes (no edges) simply don't appear — callers
    *         default them to their own id. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      localThreshold: Long = 2000000): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    // Small-graph fast path: the node set here is DISTINCT NAMES, not
    // rows — usually tiny after the distinct-name reduction. Below
    // the threshold, one collect + path-compressed union-find beats
    // ~6 Spark jobs of iteration latency; above it, fall through to
    // the distributed loop.
    val edgeCount = sym.count()
    if (edgeCount <= localThreshold) {
      val pairs = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return parent.keys.toSeq.map(k => (k, find(k))).toDF("id", "component")
    }

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // (a) propagate: min label over neighbors ∪ self
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // (b) pointer jump: label := label(label)
      val jumped = propagated.as("x")
        .join(propagated.select(col("id").as("label"), col("label").as("label2")).as("y"),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
        .localCheckpoint(true)

      val changed = jumped.as("n")
        .join(labels.withColumnRenamed("label", "old").as("o"), Seq("id"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels = jumped
      converged = changed == 0
      iter += 1
    }
    labels.withColumnRenamed("label", "component")
  }
}
