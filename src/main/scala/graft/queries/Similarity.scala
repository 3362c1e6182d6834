package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Two paths: exact brute-force cosine top-k (the correctness baseline —
  * broadcast the query set, one scan of the corpus), and a random-hyperplane
  * LSH variant (16-bit signatures, byte-banded buckets) that prunes
  * candidates before scoring — the shape that scales: at 100 TB the bucket
  * join replaces the full cross product, queries stay broadcast, and the
  * corpus is scanned once to build signatures.
  *
  * Hyperplane weights are integer-arithmetic pseudo-randoms (exact in both
  * engines); all dot products run in doubles in array order, so the DuckDB
  * oracle matches exactly.
  */
object Similarity {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private val dims = 64
  private val nPlanes = 16
  private val nQueries = 5
  private val topK = 10

  /** Deterministic integer weight for (plane, dim) in [-1000, 1000]. */
  private def weight(p: Int, d: Int): Long =
    ((1103515245L * (p * dims + d) + 12345L) % 2001L) - 1000L

  /** Codegen'd in-order dot product (graft.functions.DotProduct) over the
    * named columns; same element order as DuckDB's list_dot_product.
    */
  private def dot(a: String, b: String): Column = expr(s"dot_product($a, $b)")

  private def cosineCol(ea: String, eb: String): Column =
    round(dot(ea, eb) / sqrt(dot(ea, ea) * dot(eb, eb)), 4)

  /** Exact brute-force cosine top-k: queries (vec_id < nQueries) broadcast
    * against the full corpus, ranked per query with explicit tie-break.
    */
  val annTopk: QueryDef = QueryDef(
    // Corpus/query norms computed once per vector; the pair step does one
    // dot product. Queries broadcast; corpus scanned exactly once.
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         list_dot_product(embedding, embedding) AS norm2
       |  FROM embeddings)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (
       |           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           round(list_dot_product(q.embedding, c.embedding)
       |                 / sqrt(q.norm2 * c.norm2), 4) AS cosine
       |    FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < $nQueries) s) r
       |WHERE rank <= $topK""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.register(spark)
    val emb = spark.read.parquet(t(dir, "embeddings"))
    val e = emb.select(col("vec_id"), col("embedding"),
      dot("embedding", "embedding").as("norm2"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("norm2").as("nq"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"),
      col("norm2").as("nc"))
    val scored = broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot("eq", "ec") / sqrt(col("nq") * col("nc")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** LSH-bucketed ANN: 16 random hyperplanes -> 16-bit signature; the two
    * signature bytes are LSH bands; candidates share at least one band with
    * the query, then exact cosine + top-k within candidates.
    */
  val annLsh: QueryDef = {
    // SQL: per-plane projection as an in-order double sum with literal weights
    def projSql(p: Int): String = {
      val ws = (0 until dims).map(weight(p, _)).mkString("[", ", ", "]")
      s"list_sum(list_transform(range(1, ${dims + 1}), d -> CAST(embedding[d] AS DOUBLE) * ($ws)[d]))"
    }
    val sigSql = (0 until nPlanes)
      .map(p => s"CASE WHEN ${projSql(p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")
    QueryDef(
      s"""WITH sigs AS (
         |  SELECT vec_id, embedding, CAST($sigSql AS BIGINT) AS sig
         |  FROM embeddings),
         |bands AS (
         |  SELECT vec_id, embedding, j, (sig >> (8*j)) & 255 AS byte
         |  FROM sigs, (VALUES (0), (1)) bj(j)),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, q.embedding AS qe,
         |                  c.vec_id AS neighbor_id, c.embedding AS ce
         |  FROM bands q JOIN bands c
         |    ON q.j = c.j AND q.byte = c.byte AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $nQueries)
         |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
         |  SELECT query_id, neighbor_id,
         |         round(list_dot_product(qe, ce)
         |               / sqrt(list_dot_product(qe, qe) * list_dot_product(ce, ce)), 4) AS cosine,
         |         row_number() OVER (
         |           PARTITION BY query_id
         |           ORDER BY round(list_dot_product(qe, ce)
         |               / sqrt(list_dot_product(qe, qe) * list_dot_product(ce, ce)), 4) DESC,
         |             neighbor_id) AS rank
         |  FROM cand) r
         |WHERE rank <= $topK""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorOps.register(spark)
      val emb = spark.read.parquet(t(dir, "embeddings"))
      val sig = (0 until nPlanes).map { p =>
        val ws = (0 until dims).map(w => s"${weight(p, w)}D").mkString("array(", ", ", ")")
        when(dot("embedding", ws) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      val sigs = emb.select(col("vec_id"), col("embedding"), sig.cast("long").as("sig"))
      val bandStructs = (0 to 1).map(j =>
        struct(lit(j).as("j"),
          shiftright(col("sig"), 8 * j).bitwiseAND(lit(255L)).as("byte")))
      val bands = sigs
        .select(col("vec_id"), col("embedding"), explode(array(bandStructs: _*)).as("bv"))
        .select(col("vec_id"), col("embedding"), col("bv.j").as("j"), col("bv.byte").as("byte"))
      val q = bands.filter(col("vec_id") < nQueries)
        .select(col("j"), col("byte"), col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = bands
        .select(col("j"), col("byte"), col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      val cand = broadcast(q).join(c, Seq("j", "byte"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("qe"), col("neighbor_id"), col("ce"))
        .distinct()
      val scored = cand.select(col("query_id"), col("neighbor_id"),
        cosineCol("qe", "ce").as("cosine"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
    }
  }

  val defs: Map[String, QueryDef] = Map(
    "q_ann_topk" -> annTopk,
    "q_ann_lsh" -> annLsh)
}
