package graft

/** In-memory transcription of the reference's posting-vector merge loops
  * (/root/reference/src/query.cc:68-196,358-392,519-628) — the executable
  * specification the property tests pin PostingAlgebra against. Postings are
  * (offset, score) vectors sorted by offset, duplicates allowed.
  */
object RefModel {
  type Post = (Long, Double)
  type P = Vector[Post]

  /** UnionOffsets (query.cc:68-94): merge; at an offset tie ONE lhs element
    * is dropped and the rhs element kept. */
  def union(lhs: P, rhs: P): P = {
    val out = Vector.newBuilder[Post]
    var l = 0; var r = 0
    while (l < lhs.length && r < rhs.length) {
      if (lhs(l)._1 < rhs(r)._1) { out += lhs(l); l += 1 }
      else {
        if (lhs(l)._1 == rhs(r)._1) l += 1
        out += rhs(r); r += 1
      }
    }
    out ++= lhs.drop(l); out ++= rhs.drop(r)
    out.result()
  }

  /** IntersectOffsets (query.cc:96-125): keeps ALL lhs duplicates of a
    * matching offset; rhs advances once per lhs run. */
  def intersect(lhs: P, rhs: P): P = {
    val out = Vector.newBuilder[Post]
    var l = 0; var r = 0
    while (l < lhs.length && r < rhs.length) {
      if (lhs(l)._1 == rhs(r)._1) {
        val off = lhs(l)._1
        while (l < lhs.length && lhs(l)._1 == off) { out += lhs(l); l += 1 }
        r += 1
      } else if (lhs(l)._1 < rhs(r)._1) l += 1
      else r += 1
    }
    out.result()
  }

  /** SubtractOffsets (query.cc:358-392): removes every lhs element (incl.
    * duplicates) whose offset occurs in rhs. */
  def subtract(lhs: P, rhs: P): P = {
    val out = Vector.newBuilder[Post]
    var l = 0; var r = 0
    while (l < lhs.length && r < rhs.length) {
      if (lhs(l)._1 == rhs(r)._1) {
        val off = lhs(l)._1
        while (l < lhs.length && lhs(l)._1 == off) l += 1
        r += 1
      } else if (lhs(l)._1 < rhs(r)._1) { out += lhs(l); l += 1 }
      else r += 1
    }
    out ++= lhs.drop(l)
    out.result()
  }

  /** Join template (query.cc:171-196): equi-join on offset advancing BOTH
    * sides one element per match (1:1 through duplicate runs); keeps lhs rows
    * passing the filter. */
  def thetaJoin(lhs: P, rhs: P, keep: (Double, Double) => Boolean): P = {
    val out = Vector.newBuilder[Post]
    var l = 0; var r = 0
    while (l < lhs.length && r < rhs.length) {
      if (lhs(l)._1 < rhs(r)._1) l += 1
      else if (rhs(r)._1 < lhs(l)._1) r += 1
      else {
        if (keep(lhs(l)._2, rhs(r)._2)) out += lhs(l)
        l += 1; r += 1
      }
    }
    out.result()
  }

  /** OrderBy (query.cc:519-547): lhs keeps its offsets; score := the FIRST
    * rhs score at the same offset, else −inf. */
  def orderBy(lhs: P, rhs: P): P = {
    var r = 0
    lhs.map { case (off, _) =>
      while (r < rhs.length && rhs(r)._1 < off) r += 1
      if (r < rhs.length && rhs(r)._1 == off) (off, rhs(r)._2)
      else (off, Double.NegativeInfinity)
    }
  }

  /** RemoveDuplicates (query.cc:137-156) on offset-sorted data. */
  def dedup(p: P, useMax: Boolean): P = {
    if (p.isEmpty) return p
    val out = collection.mutable.ArrayBuffer[Post](p.head)
    for ((off, s) <- p.tail) {
      if (off != out.last._1) out += ((off, s))
      else if (useMax == (s > out.last._2)) out(out.size - 1) = (off, s)
    }
    out.toVector
  }

  def filterCmp(p: P, op: String, n: Double): P = op match {
    case "="  => p.filter(_._2 == n)
    case ">"  => p.filter(_._2 > n)
    case ">=" => p.filter(_._2 >= n)
    case "<"  => p.filter(_._2 < n)
    case "<=" => p.filter(_._2 <= n)
  }

  /** InRange with the reversed-bounds swap (query.cc:507-517). */
  def inRange(p: P, lo: Double, hi: Double): P = {
    val (l, h) = if (lo <= hi) (lo, hi) else (hi, lo)
    p.filter(x => x._2 >= l && x._2 <= h)
  }

  def negate(p: P): P = p.map { case (o, s) => (o, -s) }

  /** T1 with OUR pinned tie order (score desc, offset asc — the reference's
    * partial_sort tie order is unspecified). */
  def topK(p: P, limit: Long, skip: Long): P = {
    val sorted = p.sortBy(x => (-x._2, x._1))
    val dropped = sorted.drop(skip.toInt)
    if (limit >= 0) dropped.take(limit.toInt) else dropped
  }
}
