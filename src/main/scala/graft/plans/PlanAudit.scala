package graft.plans

/** Audit switch: operators that insert lazy localCheckpoint
  * materialization boundaries inside a query (DedupOps gram summaries,
  * AnnOps shared IVF anchors) skip them while set, so
  * `tools.ExplainAudit` can grep the FULL logical tree for the join
  * shapes and banned all-pairs operators those boundaries would hide
  * behind an ExistingRDD scan. Never set on a measured or driver-contract
  * path — the flag trades the (audited-away) shared-subtree
  * materialization for whole-tree visibility, so audit-mode plans show
  * shared subtrees expanded per consumer. BenchExtra's dump mode does NOT
  * set it: committed plan dumps keep the executed boundary structure. */
object PlanAudit {
  @volatile var NoBoundaries: Boolean = false

  /** The shared boundary operator the flag gates: a LAZY serialized
    * localCheckpoint (no dedicated materialization job — the first
    * consuming action writes the blocks; serialized so block bytes are
    * exactly accounted, see Matcher.checkpointSer). Hoisted here so the
    * audit-mode pass-through cannot drift apart across call sites
    * (DedupOps gram summaries, AnnOps IVF anchors). */
  def cpLazy(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (NoBoundaries) df
    else df.localCheckpoint(false,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
}
