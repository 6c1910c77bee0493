package graft.fed

/** A5 — the reference's closed-form memory cost model (mem.py:1-18):
  * `graphGB = (2·E·8 + N·F·8) / 2^30`, `ramGB = 3.6·graphGB + 2`.
  * Used as an admission-control heuristic when packing partitions into
  * memory-budgeted training groups (the "scheduled" variant,
  * fl_client_shed.py:155-193).
  */
object MemCost {

  def graphGB(nodes: Long, edges: Long, nFeatures: Int = 1433): Double =
    (2.0 * edges * 8 + nodes.toDouble * nFeatures * 8) / math.pow(2, 30)

  def ramGB(nodes: Long, edges: Long, nFeatures: Int = 1433): Double =
    3.6 * graphGB(nodes, edges, nFeatures) + 2.0

  /** Greedy first-fit packing of partitions into groups whose summed
    * RAM estimate stays under `budgetGB` — the shed client's sequential
    * schedule generalized to parallel groups. A partition that alone
    * exceeds the budget gets its own group (the reference would OOM;
    * we surface it to the caller instead of hiding it).
    */
  def pack[P](parts: Seq[P], budgetGB: Double)
             (cost: P => Double): Seq[Seq[P]] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[P], Double)]
    parts.foreach { p =>
      val c = cost(p)
      groups.indexWhere(_._2 + c <= budgetGB) match {
        case -1 => groups += ((scala.collection.mutable.ArrayBuffer(p), c))
        case i  =>
          val (buf, tot) = groups(i)
          buf += p
          groups(i) = (buf, tot + c)
      }
    }
    groups.map(_._1.toSeq).toSeq
  }
}
