package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps
import graft.operators.Packing
import graft.similarity.Ann

/** Round-5 data-curation surface — the corpus-preparation operators a
  * pretraining pipeline runs between raw crawl and training shards:
  * duplicated-span measurement (q75), int8 embedding quantization (q76),
  * semantic dedup over the IVF partitioning (q77), greedy sequence
  * packing (q78), and temperature-balanced corpus mixing (q79).
  *
  * Every query is DuckDB-oracled; the scale arguments live with each
  * operator (keyed joins and partial aggregation throughout — the only
  * sequential compute, q78's packing fold, is sequential per GROUP and
  * parallel across groups).
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q78 packing capacity (chars; n_chars plays the token count). */
  private val PackCapacity = 1000L

  /** q77 semantic-dedup cosine threshold. The synthetic embeddings are
    * near-uniform on the sphere (max pairwise cos ≈ 0.51 at sf0.01), so
    * a production-style 0.95 would never drop — 0.45 sits inside the
    * observed tail and exercises both branches of the keep decision. */
  private val SemThreshold = 0.45

  /** Positional hashed 3-gram shingles per doc — q75's base relation,
    * the SHARED positional base the dedup trio's distinct sets also
    * derive from ([[PipelineQueries.positionalShingleDocs]]): the md5
    * per position runs once per (session, dir) for the whole shingle
    * family. */
  private def positionalShingles(s: SparkSession, d: String): DataFrame =
    PipelineQueries.positionalShingleDocs(s, d)

  val queries: Map[String, Q] = Map(
    // Duplicated-span fraction (the Lee et al. "fraction of tokens
    // inside a duplicated n-gram" dedup diagnostic): per doc, how many
    // of its POSITIONS carry a 3-gram that occurs in >= 2 distinct docs.
    // Shapes: distinct (doc,hash) then count per hash — both partial-
    // aggregated map-side; the join back to positions is keyed on the
    // 56-bit hash. Never doc×doc. LEFT join keeps clean docs in the
    // report with 0, like q74.
    "q75_duplicated_spans" -> { (s, d) =>
      val sh = positionalShingles(s, d) // session-shared, already persisted
      val pos = graft.Caches.scopedPersist(
        sh.select(col("doc_id"), explode(col("sp")).as("h")))
      val dupHashes = pos.select("doc_id", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("h")
      val dupPos = pos.join(dupHashes, Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("nd"))
      sh.select(col("doc_id"), size(col("sp")).cast("long").as("n_pos"))
        .join(dupPos, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_pos"),
          coalesce(col("nd"), lit(0L)).as("n_dup_pos"),
          (coalesce(col("nd"), lit(0L)).cast("double") / col("n_pos"))
            .as("dup_fraction"))
        .orderBy("doc_id")
    },

    // Int8 scalar quantization + quantized top-k: per-dimension global
    // (min, max) → q = floor((x - mn) * (254/(mx - mn)) + 0.5) - 127 ∈
    // [-127, 127], then an INTEGER dot product against the quantized
    // query (vec_id 0). Integer scores are exact → hash-stable across
    // engines, unlike a float rescore. The stats aggregate is 64 rows
    // (partial-agg'd posexplode), broadcast back as one array row; the
    // quantize pass is map-only. At 100 TB this is the memory lever: the
    // quantized corpus is 4× smaller than float32 and the scan does
    // integer multiply-adds.
    "q76_quantized_similarity" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val stats = e.select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("dim").agg(min(col("x").cast("double")).as("mn"),
          max(col("x").cast("double")).as("mx"))
        .groupBy().agg(
          array_sort(collect_list(struct(col("dim"), col("mn")))).as("mns"),
          array_sort(collect_list(struct(col("dim"), col("mx")))).as("mxs"))
        .select(transform(col("mns"), p => p.getField("mn")).as("mn"),
          transform(col("mxs"), p => p.getField("mx")).as("mx"))
      val quant = graft.Caches.scopedPersist(
        e.crossJoin(broadcast(stats))
          .select(col("vec_id"), transform(col("embedding"), (x, i) => {
            val mn = element_at(col("mn"), i + 1)
            val mx = element_at(col("mx"), i + 1)
            when(mx === mn, lit(0L)).otherwise(
              floor((x.cast("double") - mn) * (lit(254.0) / (mx - mn))
                + lit(0.5)) - lit(127L))
          }).as("q")))
      val q0 = quant.filter(col("vec_id") === 0).select(col("q").as("qq"))
      quant.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q0))
        .select(col("vec_id"),
          aggregate(zip_with(col("q"), col("qq"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
    },

    // SemDeDup: semantic near-dup removal bounded by the IVF cell
    // partitioning — reuses the SAME trained codebook as q33 (the oracle
    // replays the full Lloyd chain via the shared IvfCte prefix). Report
    // form: every vector with its cell and kept 0/1.
    "q77_semantic_dedup" -> { (s, d) =>
      // literally the same trained codebook and cell assignment as q33 —
      // both read the shared IVF index, so "same partitioning" is
      // structural, not a retrained coincidence
      Ann.semanticDedupAssigned(
        graft.similarity.IvfIndex.assignments(s, d), SemThreshold)
        .orderBy("vec_id")
    },

    // Greedy sequence packing per lang (capacity = 1000 chars): the
    // sort-fold runs inside flatMapSortedGroups — sequential per group,
    // parallel across groups, one keyed shuffle. See operators/Packing.
    "q78_greedy_packing" -> { (s, d) =>
      Packing.greedyPack(Tables.documents(s, d), PackCapacity)
        .orderBy("lang", "doc_id")
    },

    // Temperature-balanced corpus mixing (alpha = 0.5 language
    // smoothing, the mT5/UniMax shape): per-lang keep rate
    // r_l = sqrt(min_cnt / cnt_l) — the kept corpus scales per-lang mass
    // from cnt_l to sqrt(min_cnt·cnt_l) ∝ cnt_l^0.5. Deterministic
    // membership via the doc's 56-bit md5 fraction, so the sample is
    // reproducible across engines AND across runs (same property as
    // q66's fixed-rate strata; here the rates are DERIVED from corpus
    // stats). Tiny rate table broadcast; the filter itself is map-only.
    "q79_temperature_mixing" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val mn = cnt.groupBy().agg(min(col("cnt")).as("mincnt"))
      val rates = cnt.crossJoin(broadcast(mn))
        .select(col("lang"),
          sqrt(col("mincnt").cast("double") / col("cnt").cast("double"))
            .as("rate"))
      docs.join(broadcast(rates), Seq("lang"))
        .filter(TextOps.hash56(col("doc_id").cast("string")).cast("double")
          / lit(72057594037927936.0) < col("rate"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q75_duplicated_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sp AS (SELECT doc_id, list_transform(generate_series(1, len(tk) - 2),
        |         i -> CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 14)) AS BIGINT)) AS sp
        |       FROM toks WHERE len(tk) >= 3),
        |pos AS (SELECT doc_id, unnest(sp) AS h FROM sp),
        |dh AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |         FROM pos GROUP BY h) WHERE nd >= 2),
        |dp AS (SELECT doc_id, count(*) AS nd FROM pos JOIN dh USING (h)
        |       GROUP BY doc_id),
        |base AS (SELECT doc_id, len(sp) AS n_pos FROM sp)
        |SELECT b.doc_id, CAST(b.n_pos AS BIGINT) AS n_pos,
        |  CAST(coalesce(dp.nd, 0) AS BIGINT) AS n_dup_pos,
        |  CAST(coalesce(dp.nd, 0) AS DOUBLE) / b.n_pos AS dup_fraction
        |FROM base b LEFT JOIN dp ON b.doc_id = dp.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q76_quantized_similarity" ->
      """WITH st AS (SELECT g.i AS dim,
        |    min(CAST(embedding[g.i + 1] AS DOUBLE)) AS mn,
        |    max(CAST(embedding[g.i + 1] AS DOUBLE)) AS mx
        |  FROM embeddings, (SELECT unnest(range(64)) AS i) g GROUP BY g.i),
        |arr AS (SELECT list(mn ORDER BY dim) AS mn, list(mx ORDER BY dim) AS mx FROM st),
        |qt AS (SELECT vec_id, list_transform(generate_series(0, 63), i ->
        |    CASE WHEN a.mx[i + 1] = a.mn[i + 1] THEN 0
        |    ELSE CAST(floor((CAST(e.embedding[i + 1] AS DOUBLE) - a.mn[i + 1])
        |      * (254.0 / (a.mx[i + 1] - a.mn[i + 1])) + 0.5) AS BIGINT) - 127 END) AS q
        |  FROM embeddings e, arr a),
        |q0 AS (SELECT q AS qq FROM qt WHERE vec_id = 0)
        |SELECT vec_id, CAST(list_sum(list_transform(generate_series(1, 64),
        |    i -> qt.q[i] * q0.qq[i])) AS BIGINT) AS score
        |FROM qt, q0 WHERE vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "q77_semantic_dedup" ->
      s"""${PipelineQueries.IvfCte},
         |best AS (SELECT b.vec_id,
         |    max(round(list_dot_product(a.nv, b.nv) / (a.nn * b.nn), 4)) AS best_prior_cos
         |  FROM asg b JOIN asg a ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  GROUP BY b.vec_id)
         |SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell, t.best_prior_cos,
         |  CASE WHEN t.best_prior_cos IS NULL OR t.best_prior_cos < $SemThreshold
         |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS kept
         |FROM asg s LEFT JOIN best t ON s.vec_id = t.vec_id
         |ORDER BY s.vec_id""".stripMargin,
    "q78_greedy_packing" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, n_chars, rn, 0 AS bin_id, n_chars AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.doc_id, d.lang, d.n_chars, d.rn,
         |    CASE WHEN p.fill + d.n_chars > $PackCapacity THEN p.bin_id + 1 ELSE p.bin_id END,
         |    CASE WHEN p.fill + d.n_chars > $PackCapacity THEN d.n_chars ELSE p.fill + d.n_chars END
         |  FROM p JOIN d ON d.lang = p.lang AND d.rn = p.rn + 1)
         |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         |  CAST(bin_id AS BIGINT) AS bin_id
         |FROM p ORDER BY lang, doc_id""".stripMargin,
    "q79_temperature_mixing" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT min(cnt) AS mincnt FROM c),
        |r AS (SELECT lang, sqrt(CAST(mincnt AS DOUBLE) / CAST(cnt AS DOUBLE)) AS rate FROM c, m)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14)) AS BIGINT) AS DOUBLE)
        |    / 72057594037927936.0 < r.rate
        |ORDER BY d.doc_id""".stripMargin
  )
}
