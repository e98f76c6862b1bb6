package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * PAIRWISE near-duplicate hits (MinHash-LSH / SimHash / embedding-LSH
  * output) into dedup GROUPS, so a pipeline can keep one canonical document
  * per cluster instead of reasoning about O(pairs) edges. The reference has
  * no graph step; this extends the dedup suite (SURVEY §7.1) with the
  * standard closing operator of every large-scale dedup pipeline.
  *
  * Algorithm: iterative min-label propagation to fixpoint. Each node starts
  * labeled with its own id; every round each node takes the minimum of its
  * label and its neighbors' labels; converged when no label changes. The
  * component id is therefore the minimum node id in the component —
  * deterministic, order-independent, and exactly what a recursive-CTE
  * transitive closure computes, which is what the DuckDB oracle does.
  *
  * Scale shape (100 TB): each round is one shuffle (groupBy node) over the
  * edge relation — the same cost profile as the Hash-to-Min / large-star
  * family used in production dedup (GraphFrames, connected-components-over
  * -MapReduce). Rounds needed = graph diameter; dedup clusters are
  * near-cliques (diameter ≤ ~2–3), so the loop runs 2–4 rounds, not
  * O(log n). Each iteration is `localCheckpoint`ed (eager) to truncate
  * lineage — without it the plan doubles per round and Catalyst re-analyzes
  * an exponentially growing tree. The edge relation is persisted once and
  * reused every round. The per-round convergence check rides on the
  * checkpoint's own job (`count` over the already-materialized delta), not
  * a second pass over the graph.
  */
object ConnectedComponents {

  /** (id, component_id) for every node appearing in `edges` (a_id, b_id).
    * component_id = min node id reachable in the undirected graph.
    *
    * Size-gated like a broadcast join: an integer-id edge list at or
    * below `spark.graft.cc.driverEdgeThreshold` (default 1M edges —
    * tens of MB collected) closes with one driver-side union-find pass
    * instead of shuffle rounds. Near-dup edge sets are SPARSE by
    * construction (LSH emits only candidate pairs, a tiny fraction of
    * the corpus), so even very large corpora often fit the gate; past
    * it — or for non-integer ids — the distributed min-label loop runs
    * unchanged off the SAME persisted edge cache (the upstream LSH
    * pipeline computes exactly once on either path; the gate's count IS
    * the cache materialization both paths need, so small graphs — the
    * common case for near-dup output — never compute twice; a
    * past-threshold graph briefly holds pairs (1×) + undirected (2×)
    * until the first round materializes, then pairs release).
    * Null-endpoint edges are filtered at the shared source (they cannot
    * connect anything, and filtering BEFORE the gate keeps both paths
    * identical on such inputs); integer-id inputs round-trip their type, with
    * MIXED int/long inputs widening to long exactly like a distributed
    * union's coercion. Both paths are spec-pinned label-identical. */
  def components(edges: DataFrame): DataFrame =
    componentsImpl(edges, withSizes = false)

  /** [[components]] plus per-cluster sizes — (id, component_id, csize) —
    * computed in the SAME pass on the driver union-find path (the counts
    * fall out of the final find() sweep; a groupBy + self-join over a
    * few-hundred-row local relation was two 32-partition shuffles of
    * pure scheduling overhead, r19 probe: 0.2–0.4 s). The distributed
    * paths keep the groupBy + join shape — there the labels relation is
    * cluster-sized and the shuffles are the real work. */
  private[operators] def componentsWithSizes(edges: DataFrame): DataFrame =
    componentsImpl(edges, withSizes = true)

  private def componentsImpl(edges: DataFrame, withSizes: Boolean): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.types.{IntegerType, LongType}
    import org.apache.spark.storage.StorageLevel
    // The checkpointed blocks of round i-1 are dead once round i is
    // materialized; without explicit release they sit in the block
    // manager until a GC + ContextCleaner pass — per-round O(|V|) debris
    // that a long-running pipeline (or the bench harness) pays for.
    def ckptRdds(df: DataFrame) =
      df.queryExecution.logical.collect { case l: LogicalRDD => l.rdd }

    val spark = edges.sparkSession
    val idTypes = edges.schema.fields.take(2).map(_.dataType)
    val intIds = idTypes.forall(t => t == LongType || t == IntegerType)
    val threshold = spark.conf
      .getOption("spark.graft.cc.driverEdgeThreshold")
      .map(_.toLong).getOrElse(1000000L)
    // mixed int/long inputs widen to long (a distributed union's
    // coercion); uniform inputs round-trip their own type
    val outTpe =
      if (idTypes.forall(_ == IntegerType)) IntegerType else LongType
    if (intIds) {
      // null-endpoint edges drop HERE, before either path: a null id
      // cannot name a node, and filtering at the shared source keeps
      // the driver union-find and the distributed loop label-identical
      // across the threshold (the union-find skips them; an unfiltered
      // distributed groupBy would emit rows for the non-null side)
      val pairs = edges
        .select(col(edges.columns(0)).cast("long").as("u"),
          col(edges.columns(1)).cast("long").as("v"))
        .where(col("u").isNotNull && col("v").isNotNull)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the count doubles as the cache materialization every consumer
      // below needs — the edge pipeline (LSH) executes exactly once
      val small = pairs.count() <= threshold
      if (small) {
        // driver union-find, union-by-min so the root IS the component's
        // minimum id — the exact labels the distributed loop converges to
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        // ONE collect, not toLocalIterator: the iterator runs one
        // sequential Spark job PER PARTITION (r19 probe: ~32 × ~20 ms of
        // pure scheduling on a tiny edge list — over half the operator's
        // wall time); the gate already bounds the pull at threshold
        // edges × 16 bytes, the same budget the scaladoc prices
        val rows = pairs.collect()
        var ri = 0
        while (ri < rows.length) {
          val row = rows(ri)
          ri += 1
          // a null endpoint cannot connect anything — skip, like the
          // distributed groupBy (null keys never beat a real min label)
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val (a, b) = (row.getLong(0), row.getLong(1))
            if (!parent.containsKey(a)) parent.put(a, a)
            if (!parent.containsKey(b)) parent.put(b, b)
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) {
              if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
            }
          }
        }
        pairs.unpersist(blocking = false)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
        parent.keySet().forEach(id => out += ((id.longValue(), find(id))))
        import spark.implicits._
        if (!withSizes)
          return out.toSeq.toDF("id", "component_id")
            .select(col("id").cast(outTpe),
              col("component_id").cast(outTpe))
            .toDF("id", "component_id")
        // sizes in the same pass: count labels driver-side
        val csize = new java.util.HashMap[Long, Long]()
        out.foreach { case (_, c) => csize.merge(c, 1L, (a, b) => a + b) }
        return out.toSeq.map { case (id, c) => (id, c, csize.get(c).longValue()) }
          .toDF("id", "component_id", "csize")
          .select(col("id").cast(outTpe),
            col("component_id").cast(outTpe), col("csize"))
          .toDF("id", "component_id", "csize")
      }
      // past the gate: the distributed loop reads the SAME cache —
      // labels carry long and cast back to outTpe at the end
      val und = pairs
        .union(pairs.select(col("v").as("u"), col("u").as("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var labels = und.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))
        .localCheckpoint()
      // und materialized by the job above; the 1× pairs copy releases
      pairs.unpersist(blocking = false)
      var prev = ckptRdds(labels)
      var changed = 1L
      while (changed > 0) {
        val fromNbrs = und
          .join(labels.select(col("id").as("vid"), col("label").as("nl")),
            col("v") === col("vid"))
          .groupBy(col("u").as("id"))
          .agg(min(col("nl")).as("nbr_label"))
        val next = labels
          .join(fromNbrs, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
            (col("nbr_label") < col("label")).as("moved"))
          .localCheckpoint()
        changed = next.filter(col("moved")).count()
        labels = next.select(col("id"), col("label"))
        prev.foreach(_.unpersist(blocking = false))
        prev = ckptRdds(next)
      }
      und.unpersist()
      return attachSizes(labels.select(col("id").cast(outTpe),
        col("label").cast(outTpe).as("component_id"))
        .toDF("id", "component_id"), withSizes)
    }

    // Non-integer ids: the distributed loop over the source relation,
    // exactly as before the gate existed.
    val und = edges
      .select(col("a_id").as("u"), col("b_id").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
      .union(edges.select(col("b_id").as("u"), col("a_id").as("v"))
        .where(col("u").isNotNull && col("v").isNotNull))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Init fused with propagation round 0: every node of an undirected
    // edge list appears as `u`, so one groupBy yields all nodes AND their
    // first-hop min label — replacing a distinct shuffle + a full loop
    // round. Diameter-1 components (plain duplicate pairs, the bulk of
    // dedup output) then converge in a single verification round.
    var labels = und.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))
      .localCheckpoint()
    var prev = ckptRdds(labels)
    var changed = 1L
    while (changed > 0) {
      // min label among each node's neighbors (the node's own label joins
      // back via `least` below — self-loops need not be materialized)
      val fromNbrs = und
        .join(labels.select(col("id").as("vid"), col("label").as("nl")),
          col("v") === col("vid"))
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("nbr_label"))
      val next = labels
        .join(fromNbrs, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("nbr_label") < col("label")).as("moved"))
        .localCheckpoint() // eager: materializes, truncates lineage
      changed = next.filter(col("moved")).count()
      labels = next.select(col("id"), col("label"))
      prev.foreach(_.unpersist(blocking = false))
      prev = ckptRdds(next)
    }
    und.unpersist()
    attachSizes(labels.select(col("id"), col("label").as("component_id")),
      withSizes)
  }

  /** The distributed-path size attachment (groupBy + join — the labels
    * relation is cluster-sized there, so the shuffles are real work). */
  private def attachSizes(comp: DataFrame, withSizes: Boolean): DataFrame =
    if (!withSizes) comp
    else comp.join(
      comp.groupBy(col("component_id")).agg(count(lit(1)).as("csize")),
      "component_id")
      .select(col("id"), col("component_id"), col("csize"))

  /** Cluster membership with sizes: (doc_id, component_id, csize). The
    * canonical representative of each cluster is component_id itself (the
    * minimum doc id); every other member is redundant and droppable.
    */
  def dedupClusters(edges: DataFrame): DataFrame =
    componentsWithSizes(edges)
      .select(col("id").as("doc_id"), col("component_id"), col("csize"))
}
