package graft.stencil

import scala.collection.immutable.ArraySeq
import scala.collection.mutable

/** One step of the stencil stream, as consumed by the search loop: a
  * relative offset (in units of the current per-dimension step size) plus the
  * number of step halvings the step implies. This is the reduction of the
  * reference's `SimplexPoint` (stencil.py:7-64) to the two fields the driver
  * loop reads (search.py:266-267). `halvings` may be negative: the stencil
  * contains step-doubling expansion moves (stencil.py:17-23).
  */
final case class StencilStep(offset: Array[Double], halvings: Int) {
  override def toString: String =
    s"StencilStep([${offset.mkString(", ")}], halvings=$halvings)"
}

/** Lazy, infinite, deterministic stream of pattern-search trial offsets.
  *
  * Re-expression of the reference's `RightHandedSimplexStencil`
  * (stencil.py:77-204): a breadth-first expansion over reflections and
  * contractions of a right-handed simplex `[0-row; I_d]`, with two-level
  * deduplication — a spatially novel point is emitted exactly once
  * (`firstSeen` on the snapped coordinates, stencil.py:132-135), while a
  * spatially-seen point reached through a structurally new simplex still
  * propagates the BFS (`seen` on the full structural identity,
  * stencil.py:48-61, 169-176).
  *
  * All coordinates live on a fixed relative lattice with spacing
  * `2^(-maxHalvings-1)` (stencil.py:84, 126-127), which makes coordinate
  * equality exact and hash-based dedup sound.
  *
  * Generation is pure driver-side math (no Spark): the BFS order IS the
  * semantics the search loop depends on (the first `2*dims` steps must be the
  * unit axial steps ±e_i; search.py:254, 261, 286 key on that prefix).
  * Instances are not thread-safe; the search loop owns one instance.
  */
final class RightHandedSimplexStencil(val dims: Int, val maxHalvings: Int) {
  require(dims >= 1, s"dims must be >= 1, got $dims")

  val gridsize: Double = math.pow(2.0, -maxHalvings - 1)

  /** Snap a scalar to the stencil's relative lattice (stencil.py:126-127).
    * rint = round-half-even, matching NumPy. `+ 0.0` folds -0.0 into +0.0 so
    * the same location can never acquire two distinct keys.
    */
  def toGrid(x: Double): Double = math.rint(x / gridsize) * gridsize + 0.0

  private def toGrid(xs: Array[Double]): Array[Double] = {
    val out = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) { out(i) = toGrid(xs(i)); i += 1 }
    out
  }

  // A simplex is a (dims+1) x dims matrix of small ints, stored flat
  // row-major and interned so structural identity checks are cheap
  // (the reference interns raw int8 bytes, stencil.py:100-110).
  private type Simplex = ArraySeq[Int]
  private val simplexIntern = mutable.HashMap.empty[Simplex, Simplex]

  private def intern(s: Simplex): Simplex = simplexIntern.getOrElseUpdate(s, s)

  private val initialSimplex: Simplex = intern(ArraySeq.unsafeWrapArray(
    Array.tabulate((dims + 1) * dims) { k =>
      val row = k / dims; val col = k % dims
      if (row == col + 1) 1 else 0
    }))

  /** Child simplex for vertex `index`: translate so vertex `index` is the
    * origin, reorder rows to `[index, 0..index-1, index+1..dims]`, and negate
    * if reflecting (stencil.py:100-110 + indexers stencil.py:86-89).
    */
  private def childSimplex(parent: Simplex, index: Int, isReflect: Boolean): Simplex = {
    if (index == 0 && !isReflect) return parent
    val d = dims
    val out = new Array[Int]((d + 1) * d)
    val sign = if (isReflect) -1 else 1
    var outRow = 0
    var srcRow = index // row order: index first, then all others in order
    var r = 0
    while (r <= d) {
      srcRow = if (r == 0) index else if (r <= index) r - 1 else r
      var c = 0
      while (c < d) {
        out(outRow * d + c) = sign * (parent(srcRow * d + c) - parent(index * d + c))
        c += 1
      }
      outRow += 1
      r += 1
    }
    intern(ArraySeq.unsafeWrapArray(out))
  }

  /** Internal BFS node: relative grid-snapped location + structural identity
    * (reference SimplexPoint, stencil.py:7-64).
    */
  private final class Node(
      val point: Array[Double],
      val pointKey: ArraySeq[Double],
      val stepsize: Double,
      val halvings: Int,
      val index: Int,
      val isReflect: Boolean,
      val isDoubled: Boolean,
      val simplex: Simplex) {
    def identity: (ArraySeq[Double], Simplex, Int, Int, Boolean, Boolean) =
      (pointKey, simplex, index, halvings, isReflect, isDoubled)
    def toStep: StencilStep = StencilStep(point, halvings)
  }

  private def mkNode(
      coords: Array[Double],
      parentSimplex: Simplex, parentStep: Double, parentHalvings: Int,
      parentIsReflect: Boolean, parentIsDoubled: Boolean,
      index: Int, isReflect: Boolean, isContract: Boolean): Node = {
    // Step doubling: a reflect-of-reflect at vertex 1 expands the step
    // (stencil.py:17-23) — this is why halvings can go negative.
    val isDoubled = isReflect && parentIsReflect && index == 1 && !parentIsDoubled
    var stepsize = parentStep
    var halvings = parentHalvings
    if (isContract) { stepsize = toGrid(0.5 * stepsize); halvings += 1 }
    else if (isDoubled) { stepsize = toGrid(2.0 * stepsize); halvings -= 1 }
    val simplex = childSimplex(parentSimplex, index, isReflect)
    val snapped = coords // callers pass already-snapped coords
    new Node(snapped, ArraySeq.unsafeWrapArray(snapped), stepsize, halvings,
      index, isReflect, isDoubled, simplex)
  }

  private def row(s: Simplex, r: Int): Int => Int = c => s(r * dims + c)

  /** Non-origin vertices of the simplex: `point + stepsize * simplex[1..d]`
    * (stencil.py:32-34).
    */
  private def childPoints(p: Node): IndexedSeq[Node] =
    (1 to dims).map { i =>
      val rw = row(p.simplex, i)
      val coords = toGrid(Array.tabulate(dims)(c => p.point(c) + p.stepsize * rw(c)))
      mkNode(coords, p.simplex, p.stepsize, p.halvings, p.isReflect, p.isDoubled,
        i, isReflect = false, isContract = false)
    }

  /** Mirror children `point - stepsize * simplex[i]`; a pure re-reflection at
    * vertex 0 of an (undoubled) reflection is suppressed (stencil.py:36-40).
    */
  private def reflections(p: Node): IndexedSeq[Node] =
    if (p.index == 0 && p.isReflect && !p.isDoubled) IndexedSeq.empty
    else (0 to dims).map { i =>
      val rw = row(p.simplex, i)
      val coords = toGrid(Array.tabulate(dims)(c => p.point(c) - p.stepsize * rw(c)))
      mkNode(coords, p.simplex, p.stepsize, p.halvings, p.isReflect, p.isDoubled,
        i, isReflect = true, isContract = false)
    }

  /** Half-step children `point + 0.5 * stepsize * simplex[i]`, bounded by
    * `maxHalvings` (stencil.py:42-46).
    */
  private def contractions(p: Node): IndexedSeq[Node] =
    if (p.halvings > maxHalvings) IndexedSeq.empty
    else (0 to dims).map { i =>
      val rw = row(p.simplex, i)
      val coords = toGrid(Array.tabulate(dims)(c => p.point(c) + 0.5 * p.stepsize * rw(c)))
      mkNode(coords, p.simplex, p.stepsize, p.halvings, p.isReflect, p.isDoubled,
        i, isReflect = false, isContract = true)
    }

  /** Round-robin across children sequences, column by column — the order
    * toolz.interleave produces (stencil.py:156-161 fairness across queues).
    */
  private def interleaved(groups: Seq[IndexedSeq[Node]]): Iterator[Node] = {
    val live = groups.filter(_.nonEmpty)
    if (live.isEmpty) Iterator.empty
    else {
      val maxLen = live.map(_.length).max
      (0 until maxLen).iterator.flatMap(col => live.iterator.collect {
        case g if col < g.length => g(col)
      })
    }
  }

  /** The live BFS generator (stencil.py:129-200): five priority queues, a
    * reflections pass then a contractions pass per round. Terminates when all
    * queues drain (possible once maxHalvings bounds the contraction depth;
    * the reference handles the equivalent StopIteration at search.py:253-257).
    */
  private final class Gen extends Iterator[StencilStep] {
    private val seen = mutable.HashSet.empty[(ArraySeq[Double], Simplex, Int, Int, Boolean, Boolean)]
    private val firstSeen = mutable.HashSet.empty[ArraySeq[Double]]

    private var selfReflect = List.empty[Node]
    private var mirrorReflect = List.empty[Node]
    private var reflect = List.empty[Node]
    private var selfContract = List.empty[Node]
    private var contract = List.empty[Node]

    private var out: Iterator[StencilStep] = Iterator.empty

    locally {
      val origin = toGrid(new Array[Double](dims))
      val root = mkNode(origin, initialSimplex, 1.0, 0,
        parentIsReflect = false, parentIsDoubled = false,
        index = 0, isReflect = false, isContract = false)
      seen += root.identity
      firstSeen += root.pointKey
      val first = childPoints(root) // the d positive axial steps
      first.foreach { p => firstSeen += p.pointKey; seen += p.identity }
      selfContract = List(root)
      out = first.iterator.map(_.toStep)
    }

    private def advanceRound(): Unit = {
      val queues = Seq(selfReflect, mirrorReflect, reflect, selfContract, contract)
      val emitted = mutable.ArrayBuffer.empty[StencilStep]
      val nextSelfReflect = mutable.ListBuffer.empty[Node]
      val nextMirrorReflect = mutable.ListBuffer.empty[Node]
      val nextReflect = mutable.ListBuffer.empty[Node]
      val nextSelfContract = mutable.ListBuffer.empty[Node]
      val nextContract = mutable.ListBuffer.empty[Node]

      // Reflections pass (stencil.py:156-176)
      for (q <- queues; p <- interleaved(q.map(reflections))) {
        if (!firstSeen.contains(p.pointKey)) {
          emitted += p.toStep
          firstSeen += p.pointKey
          seen += p.identity
          nextReflect += p
        } else if (seen.add(p.identity)) {
          if (p.index == 0) nextSelfReflect += p
          else if (p.index == 1) nextMirrorReflect += p
          else nextReflect += p
        }
      }
      // Contractions pass over the same (old) queues (stencil.py:177-195)
      for (q <- queues; p <- interleaved(q.map(contractions))) {
        if (!firstSeen.contains(p.pointKey)) {
          emitted += p.toStep
          firstSeen += p.pointKey
          seen += p.identity
          nextContract += p
        } else if (seen.add(p.identity)) {
          if (p.index == 0) nextSelfContract += p
          else nextContract += p
        }
      }
      selfReflect = nextSelfReflect.toList
      mirrorReflect = nextMirrorReflect.toList
      reflect = nextReflect.toList
      selfContract = nextSelfContract.toList
      contract = nextContract.toList
      out = emitted.iterator
    }

    private def queuesEmpty: Boolean =
      selfReflect.isEmpty && mirrorReflect.isEmpty && reflect.isEmpty &&
        selfContract.isEmpty && contract.isEmpty

    override def hasNext: Boolean = {
      while (!out.hasNext && !queuesEmpty) advanceRound()
      out.hasNext
    }

    override def next(): StencilStep =
      if (hasNext) out.next() else Iterator.empty.next()
  }

  // Prefix cache: every recenter replays the already-generated prefix without
  // regenerating it (stencil.py:97-98, 136, 202-203).
  private val cache = mutable.ArrayBuffer.empty[StencilStep]
  private val live = new Gen

  /** Deterministic infinite-ish stream of stencil steps; each call returns a
    * fresh iterator that replays the cached prefix then extends it
    * (stencil.py:202-203). Only one returned iterator should be actively
    * consumed at a time (matching the reference's usage).
    */
  def stencilPoints: Iterator[StencilStep] = new Iterator[StencilStep] {
    private var i = 0
    override def hasNext: Boolean = i < cache.length || live.hasNext
    override def next(): StencilStep = {
      if (i >= cache.length) cache += live.next()
      val s = cache(i)
      i += 1
      s
    }
  }
}
