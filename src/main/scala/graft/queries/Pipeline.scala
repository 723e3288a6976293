package graft.queries

import graft.core.Tables
import graft.pipeline.{Decontam, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators in the correctness gate. The DuckDB
  * oracles reproduce the exact algorithms (same md5-derived hashes, same
  * fold order for float sums), so these hash-match rather than just
  * row-count-match.
  */
object Pipeline {

  // ---- shared DuckDB CTE fragments -------------------------------------

  /** words per doc (lowercased whitespace split). */
  private val wordsCte =
    """words AS (
      |  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents
      |)""".stripMargin

  /** Shared-support drift histograms (must mirror
    * Drift.pairedBinCounts): per (lang vs 'en') pair, DENSE 20-bin
    * fixed-width counts of n_chars on a GLOBAL grid, plus per-pair
    * totals — the common front half of q_dq_wasserstein / q_dq_jsd.
    */
  private val drBinsCte =
    """base AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v FROM documents),
      |bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM base),
      |pd AS (SELECT DISTINCT g AS pair FROM base WHERE g <> 'en'),
      |tagged AS (
      |  SELECT g AS pair, 0 AS is_base, v FROM base WHERE g <> 'en'
      |  UNION ALL
      |  SELECT pair, 1, v FROM base CROSS JOIN pd WHERE g = 'en'),
      |binned AS (
      |  SELECT pair,
      |         least(19, CAST(floor((v - lo) / ((hi - lo) / 20)) AS BIGINT)) AS bin,
      |         sum(CASE WHEN is_base = 1 THEN 1 ELSE 0 END) AS nb,
      |         sum(CASE WHEN is_base = 0 THEN 1 ELSE 0 END) AS nx
      |  FROM tagged CROSS JOIN bounds GROUP BY 1, 2),
      |spine AS (SELECT pair, unnest(range(0, 20)) AS bin FROM pd),
      |dense AS (
      |  SELECT spine.pair, spine.bin,
      |         coalesce(nb, 0) AS nb, coalesce(nx, 0) AS nx
      |  FROM spine LEFT JOIN binned
      |    ON spine.pair = binned.pair AND spine.bin = binned.bin),
      |tot AS (SELECT pair, sum(nb) AS tb, sum(nx) AS tx FROM dense GROUP BY 1)""".stripMargin

  /** portable hash31 of an expression (must mirror TextAnalysis.hash31). */
  private def h31(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT) % 2147483647"

  /** distinct sorted 3-gram shingle hash sets per doc: md5 per word, then
    * the same arithmetic combination as
    * TextAnalysis.shingleHashesFromWordHashes (identical precedence).
    */
  private val shinglesCte =
    s"""wh AS (
       |  SELECT doc_id, [${h31("x")} for x in w] AS wh FROM words
       |), sh AS (
       |  SELECT doc_id,
       |         list_sort(list_distinct(
       |           [(wh[i] * 1000003 % 2147483647 * 1000003 % 2147483647
       |             + wh[i+1] * 999983 % 2147483647
       |             + wh[i+2]) % 2147483647
       |            for i in range(1, len(wh) - 1)])) AS hs
       |  FROM wh
       |)""".stripMargin

  /** brute-force verified near-dup pairs at threshold 0.8 → CTE `vp`. */
  private val verifiedPairsCte =
    s"""ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
       |cnt AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |sizes AS (SELECT doc_id, len(hs) AS n FROM sh),
       |vp AS (
       |  SELECT doc_a, doc_b,
       |         floor((inter * 1.0 / (sa.n + sb.n - inter)) * 1e4 + 0.5) / 1e4 AS jaccard
       |  FROM cnt
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE floor((inter * 1.0 / (sa.n + sb.n - inter)) * 1e4 + 0.5) / 1e4 >= 0.8
       |)""".stripMargin

  private val jaccardOracle =
    s"""WITH $wordsCte, $shinglesCte, $verifiedPairsCte
       |SELECT doc_a, doc_b, jaccard FROM vp ORDER BY doc_a, doc_b""".stripMargin

  /** cosine with the same fold order as Similarity (left-to-right sum). */
  private val embCte =
    """e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings)"""
  private def dotSql(a: String, b: String) =
    s"list_reduce([$a[i] * $b[i] for i in range(1, len($a) + 1)], (x, y) -> x + y)"
  private def normSql(a: String) =
    s"sqrt(list_reduce([x * x for x in $a], (x, y) -> x + y))"
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** packed sign-bit signature halves → CTE `sig` (mirrors
    * Similarity.binarySig: bit `d` / `d-32` of the lo/hi half set iff
    * v[d+1] > 0; two 32-bit halves keep the BIGINT sign bit out of play).
    */
  private val sigCte =
    """sig AS (
      |  SELECT vec_id, v,
      |         list_reduce([CASE WHEN v[d + 1] > 0
      |             THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END
      |           for d in range(0, 32)], (a, b) -> a + b) AS sig_lo,
      |         list_reduce([CASE WHEN v[d + 1] > 0
      |             THEN (CAST(1 AS BIGINT) << (d - 32)) ELSE CAST(0 AS BIGINT) END
      |           for d in range(32, 64)], (a, b) -> a + b) AS sig_hi
      |  FROM e
      |)""".stripMargin

  /** Corpus-vs-corpus Hamming-index top-k replay → CTE `knn(q_id, vec_id,
    * cos, rank)` (mirrors Similarity.hammingTopK with queries = corpus:
    * integer Hamming candidate ranking with vec_id tie-break, crank <=
    * k·candMult, exact-cosine rerank). `cos` is raw — round at use sites.
    */
  private def hammingKnnCtes(k: Int, candMult: Int): String =
    s"""cand AS (
       |  SELECT a.vec_id AS q_id, a.v AS qv, b.vec_id, b.v,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY bit_count(xor(a.sig_lo, b.sig_lo))
       |                  + bit_count(xor(a.sig_hi, b.sig_hi)), b.vec_id) AS crank
       |  FROM sig a JOIN sig b ON a.vec_id != b.vec_id
       |),
       |knn AS (
       |  SELECT q_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY cos DESC, vec_id) AS rank
       |  FROM (SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos
       |        FROM cand WHERE crank <= ${k * candMult})
       |)""".stripMargin

  /** Banded kNN-graph replay → CTE `knn(q_id, vec_id, cos, rank)`
    * (mirrors Similarity.knnGraphBanded: `bands` equal bit-slices of the
    * packed signature, ≥1-band collision candidates, exact Hamming rank
    * with vec_id tie-break, cosine rerank). Shares `knn`'s shape with
    * [[hammingKnnCtes]] so the graph-oracle tails (prIter/lpIter) compose
    * with either route.
    */
  private def bandedKnnCtes(k: Int, candMult: Int, bands: Int): String = {
    val w = 64 / bands
    val mask = (1L << w) - 1
    s"""bnd AS (
       |  SELECT vec_id, t.i AS band,
       |         CASE WHEN t.i * $w < 32 THEN (sig_lo >> (t.i * $w)) & $mask
       |              ELSE (sig_hi >> (t.i * $w - 32)) & $mask END AS bval
       |  FROM sig, range(0, $bands) t(i)),
       |up AS (
       |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM bnd x JOIN bnd y ON x.band = y.band AND x.bval = y.bval
       |                        AND x.vec_id < y.vec_id),
       |cp AS (SELECT a_id AS q_id, b_id AS vec_id FROM up
       |       UNION ALL SELECT b_id AS q_id, a_id AS vec_id FROM up),
       |bcand AS (
       |  SELECT cp.q_id, cp.vec_id, qa.v AS qv, qb.v AS v,
       |         row_number() OVER (PARTITION BY cp.q_id
       |           ORDER BY bit_count(xor(qa.sig_lo, qb.sig_lo))
       |                  + bit_count(xor(qa.sig_hi, qb.sig_hi)), cp.vec_id) AS crank
       |  FROM cp JOIN sig qa ON cp.q_id = qa.vec_id
       |          JOIN sig qb ON cp.vec_id = qb.vec_id),
       |knn AS (
       |  SELECT q_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY cos DESC, vec_id) AS rank
       |  FROM (SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos
       |        FROM bcand WHERE crank <= ${k * candMult}))""".stripMargin
  }

  /** One unrolled PageRank power iteration over CTEs `ed(src, dst)`,
    * `dg(src, deg)`, `nn(n)`, `e(vec_id, …)` and `r\$prev` → `r\$cur`
    * (damping 0.85, teleport 0.15/n). Shared by the exact-threshold and
    * kNN-graph centrality oracles.
    */
  private def prIter(prev: String, cur: String): String =
    s"""c$cur AS (
       |  SELECT ed.dst AS id, sum(r$prev.rank / dg.deg) AS i
       |  FROM ed JOIN r$prev ON ed.src = r$prev.id
       |          JOIN dg ON ed.src = dg.src
       |  GROUP BY 1
       |), r$cur AS (
       |  SELECT e.vec_id AS id,
       |         0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c$cur.i, 0.0) AS rank
       |  FROM e LEFT JOIN c$cur ON e.vec_id = c$cur.id
       |)""".stripMargin

  /** One unrolled PERSONALIZED PageRank round: teleport mass to the
    * vec_id < 10 seed set instead of uniformly (mirrors
    * Graph.pageRankPersonalized on the q_pl_ppr gate).
    */
  private def pprIter(prev: String, cur: String): String =
    s"""c$cur AS (
       |  SELECT ed.dst AS id, sum(r$prev.rank / dg.deg) AS i
       |  FROM ed JOIN r$prev ON ed.src = r$prev.id
       |          JOIN dg ON ed.src = dg.src
       |  GROUP BY 1
       |), r$cur AS (
       |  SELECT e.vec_id AS id,
       |         0.15 * (CASE WHEN e.vec_id < 10 THEN 0.1 ELSE 0.0 END)
       |           + 0.85 * coalesce(c$cur.i, 0.0) AS rank
       |  FROM e LEFT JOIN c$cur ON e.vec_id = c$cur.id
       |)""".stripMargin

  /** One unrolled synchronous label-propagation round over `ed(src, dst)`
    * and `l\$prev(id, label)` → `l\$cur` (most frequent neighbor label,
    * ties to the smaller label, isolated nodes keep their own) — mirrors
    * Graph.labelPropagation's deterministic update.
    */
  private def lpIter(prev: String, cur: String): String =
    s"""cnt$cur AS (
       |  SELECT ed.src AS id, l$prev.label AS nl, count(*) AS c
       |  FROM ed JOIN l$prev ON ed.dst = l$prev.id
       |  GROUP BY 1, 2
       |), pk$cur AS (
       |  SELECT id, nl,
       |         row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
       |  FROM cnt$cur
       |), l$cur AS (
       |  SELECT l$prev.id, coalesce(pk$cur.nl, l$prev.label) AS label
       |  FROM l$prev LEFT JOIN pk$cur ON l$prev.id = pk$cur.id AND pk$cur.rn = 1
       |)""".stripMargin

  /** One unrolled BPE training round over `v\$p(word, cnt, toks)` →
    * `v\$r` + merge row `m\$r` — mirrors TextAnalysis.bpeTrain exactly:
    * zipped-adjacent pair counts weighted by word frequency, argmax with
    * (count desc, x, y) tie-break, left-to-right non-overlapping apply
    * via island-parity selection. MATERIALIZED is load-bearing: the
    * vocab CTE is referenced twice per round — inlined, the chain
    * re-expands exponentially across rounds.
    */
  private def bpeRound(p: Int, r: Int): String = {
    val m = s"(SELECT x FROM m$r)"
    val my = s"(SELECT y FROM m$r)"
    s"""pc$r AS (
       |  SELECT x, y, sum(cnt) AS c FROM (
       |    SELECT cnt, unnest(toks[1:len(toks)-1]) AS x, unnest(toks[2:len(toks)]) AS y
       |    FROM v$p WHERE len(toks) >= 2)
       |  GROUP BY 1, 2),
       |m$r AS MATERIALIZED (SELECT x, y, c FROM pc$r ORDER BY c DESC, x, y LIMIT 1),
       |ex$r AS (
       |  SELECT word, cnt, unnest(generate_series(1, len(toks))) AS i, toks
       |  FROM v$p),
       |ex2_$r AS (
       |  SELECT word, cnt, i, toks[i] AS t,
       |         CASE WHEN i < len(toks) THEN toks[i+1] END AS nxt
       |  FROM ex$r),
       |mm$r AS (
       |  SELECT *, coalesce(t = $m AND nxt = $my, false) AS mt FROM ex2_$r),
       |gg$r AS (
       |  SELECT *, CASE WHEN mt THEN i - row_number() OVER (PARTITION BY word, mt ORDER BY i) END AS grp
       |  FROM mm$r),
       |ss$r AS (
       |  SELECT *, mt AND (row_number() OVER (PARTITION BY word, grp ORDER BY i) - 1) % 2 = 0 AS sel
       |  FROM gg$r),
       |sp$r AS (
       |  SELECT *, coalesce(lag(sel) OVER (PARTITION BY word ORDER BY i), false) AS selp
       |  FROM ss$r),
       |nv$r AS (
       |  SELECT word, cnt, i,
       |         CASE WHEN sel THEN $m || $my WHEN selp THEN NULL ELSE t END AS newt
       |  FROM sp$r),
       |v$r AS MATERIALIZED (
       |  SELECT word, cnt, list(newt ORDER BY i) AS toks
       |  FROM nv$r WHERE newt IS NOT NULL GROUP BY 1, 2)""".stripMargin
  }

  /** lang-ID stopword scores → CTE `scored` (mirrors TextAnalysis.langId). */
  private val langScoredCte: String = {
    val scores = TextAnalysis.Lexicons.map { case (l, ws) =>
      s"floor((len([x for x in w if x IN (${ws.map(x => s"'$x'").mkString(",")})]) * 1.0 / len(w)) * 1e4 + 0.5) / 1e4 AS score_$l"
    }.mkString(",\n       ")
    s"""scored AS (
       |  SELECT doc_id, $scores
       |  FROM words
       |)""".stripMargin
  }

  /** first-dominant-language CASE chain over the `scored` columns. */
  private val langCaseSql: String = {
    val langs = TextAnalysis.Lexicons.map(_._1)
    langs.reverse.foldLeft("'und'") { (acc, l) =>
      val dom = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"CASE WHEN score_$l > 0 AND $dom THEN '$l' ELSE $acc END"
    }
  }

  /** The WITH-body CTE chain replaying Clustering.kmeans — same seeds (k
    * smallest vec_ids), same left-to-right distance folds, same 1e-4
    * centroid rounding, same lowest-index tie-breaks — up to a final
    * `asg(vec_id, v, ds)` relation (ds = per-cell distance list against
    * the final centroids); shared by the kmeans gate and compositions.
    */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String = {
    val ds =
      s"""[list_reduce([(v[j] - cc[j]) * (v[j] - cc[j]) for j in range(1, $dim + 1)],
         |  (a, b) -> a + b) for cc in cs]""".stripMargin
    val iterCtes = (1 to iters).map { t =>
      val prev = if (t == 1) "seeds" else s"c${t - 1}"
      s"""a$t AS (
         |  SELECT vec_id, v, list_indexof(ds, list_min(ds)) - 1 AS c
         |  FROM (SELECT vec_id, v, $ds AS ds FROM e CROSS JOIN $prev)
         |), c$t AS (
         |  SELECT list(cv ORDER BY cluster) AS cs FROM (
         |    SELECT r.cluster, coalesce(m.cv, prev.cs[CAST(r.cluster AS INT) + 1]) AS cv
         |    FROM range(0, $k) r(cluster)
         |    LEFT JOIN (
         |      SELECT c AS cluster, list(mval ORDER BY d) AS cv FROM (
         |        SELECT c, d, floor(avg(v[d]) * 1e4 + 0.5) / 1e4 AS mval
         |        FROM a$t CROSS JOIN range(1, $dim + 1) t(d) GROUP BY c, d
         |      ) GROUP BY c
         |    ) m ON m.cluster = r.cluster
         |    CROSS JOIN $prev prev
         |  )
         |)""".stripMargin
    }.mkString(",\n")
    s"""$embCte,
       |seeds AS (SELECT list(v ORDER BY vec_id) AS cs
       |          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k)),
       |$iterCtes,
       |asg AS (SELECT vec_id, v, $ds AS ds FROM e CROSS JOIN c$iters)""".stripMargin
  }

  /** Replays Pq.fit / Pq.encode / Pq.adcTopK: per subvector block j, the
    * same deterministic kmeans CTE chain as [[kmeansCtes]] over the slice
    * (smallest-vec_id seeds, left-to-right folds, 1e-4-rounded updates,
    * first-index ties), then codes by argmin against the block books,
    * per-query LUTs, and the left-to-right ADC sum — the ranking is
    * bit-identical by construction.
    */
  private def pqAdcSum(m: Int): String =
    (0 until m).map(j => s"q.lut$j[CAST(c.codes[${j + 1}] AS INT) + 1]").mkString(" + ")

  /** CTE chain replaying Pq.fit / Pq.encode / Pq.lutFrame (shared by the
    * PQ gate and the IVFPQ composition): per-block 1..iters-iteration
    * kmeans over the slice, `codes(vec_id, codes)`, `luts(q_id, lut0..)`.
    */
  private def pqCtes(m: Int, ksub: Int, iters: Int, dim: Int, nq: Int,
      src: String = "e0all", vecExpr: String = "ev", withLuts: Boolean = true): String = {
    val sub = dim / m
    val blocks = 0 until m
    def ds(cs: String) =
      s"""[list_reduce([(v[i] - cc[i]) * (v[i] - cc[i]) for i in range(1, $sub + 1)],
         |  (a, b) -> a + b) for cc in $cs]""".stripMargin
    val blockCtes = blocks.map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      val iterCtes = (1 to iters).map { t =>
        val prev = if (t == 1) s"s$j" else s"c${t - 1}_$j"
        s"""a${t}_$j AS (
           |  SELECT vec_id, v, list_indexof(ds, list_min(ds)) - 1 AS c
           |  FROM (SELECT vec_id, v, ${ds("cs")} AS ds FROM e$j CROSS JOIN $prev)
           |), c${t}_$j AS (
           |  SELECT list(cv ORDER BY cluster) AS cs FROM (
           |    SELECT r.cluster, coalesce(mm.cv, prev.cs[CAST(r.cluster AS INT) + 1]) AS cv
           |    FROM range(0, $ksub) r(cluster)
           |    LEFT JOIN (
           |      SELECT c AS cluster, list(mval ORDER BY d) AS cv FROM (
           |        SELECT c, d, floor(avg(v[d]) * 1e4 + 0.5) / 1e4 AS mval
           |        FROM a${t}_$j CROSS JOIN range(1, $sub + 1) t(d) GROUP BY c, d
           |      ) GROUP BY c
           |    ) mm ON mm.cluster = r.cluster
           |    CROSS JOIN $prev prev
           |  )
           |)""".stripMargin
      }.mkString(",\n")
      val lutCte =
        if (withLuts)
          s""",
             |l$j AS (SELECT vec_id AS q_id, ${ds("cs")} AS lut
             |        FROM e$j CROSS JOIN c${iters}_$j WHERE vec_id < $nq)""".stripMargin
        else ""
      s"""e$j AS (SELECT vec_id, $vecExpr[$lo:$hi] AS v FROM $src),
         |s$j AS (SELECT list(v ORDER BY vec_id) AS cs
         |        FROM (SELECT vec_id, v FROM e$j ORDER BY vec_id LIMIT $ksub)),
         |$iterCtes,
         |g$j AS (SELECT vec_id, list_indexof(ds, list_min(ds)) - 1 AS c
         |        FROM (SELECT vec_id, ${ds("cs")} AS ds FROM e$j CROSS JOIN c${iters}_$j))$lutCte""".stripMargin
    }.mkString(",\n")
    val codeJoins = blocks.tail.map(j => s"JOIN g$j USING (vec_id)").mkString(" ")
    val lutJoins = blocks.tail.map(j => s"JOIN l$j USING (q_id)").mkString(" ")
    val base =
      if (src == "e0all")
        "e0all AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS ev FROM embeddings),\n"
      else ""
    val lutsCte =
      if (withLuts)
        s""",
           |luts AS (SELECT q_id, ${blocks.map(j => s"l$j.lut AS lut$j").mkString(", ")}
           |         FROM l0 $lutJoins)""".stripMargin
      else ""
    s"""$base$blockCtes,
       |codes AS (SELECT vec_id, [${blocks.map(j => s"g$j.c").mkString(", ")}] AS codes
       |          FROM g0 $codeJoins)$lutsCte""".stripMargin
  }

  /** Replays the OPQ serving chain: the FROZEN rotation artifact as a
    * plan-literal matrix (each rotated dim = one left-to-right product
    * fold — the Spark `rotate` twin), then the full [[pqCtes]] fit/encode
    * chain and the ADC ranking over the ROTATED frame. The trainer
    * (Pq.fitOpq: alternating k-means / Procrustes-SVD) is deliberately
    * NOT replayed — its output is the recorded checkpoint both engines
    * embed, the same stance as every pre-rounded applied constant.
    */
  /** The frozen OPQ rotation checkpoint (repo-root artifact, committed;
    * regenerate with `runMain graft.tools.OpqFit` after a testdata
    * regeneration). Loaded once — lazily, so only OPQ surfaces pay for
    * or depend on it.
    */
  private lazy val opqRotation: Array[Array[Double]] =
    graft.pipeline.Pq.loadRotation("OPQ_ROTATION.txt")

  private def opqOracle(r: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int, dim: Int, nq: Int, k: Int): String = {
    val rowsLit = r.map(row => "[" + row.mkString(", ") + "]").mkString(", ")
    s"""WITH e0all AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS ev FROM embeddings),
       |rot AS (SELECT vec_id,
       |  [list_reduce([ev[i] * rr[i] for i in range(1, $dim + 1)], (a, b) -> a + b)
       |   for rr in [$rowsLit]] AS rv
       |  FROM e0all),
       |${pqCtes(m, ksub, iters, dim, nq, src = "rot", vecExpr = "rv")},
       |ranked AS (
       |  SELECT q_id, vec_id, adc,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
       |  FROM (SELECT q.q_id, c.vec_id, ${pqAdcSum(m)} AS adc
       |        FROM codes c CROSS JOIN luts q WHERE c.vec_id != q.q_id)
       |)
       |SELECT q_id, vec_id, rank, floor(adc * 1e4 + 0.5) / 1e4 AS adc_dist
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  private def pqOracle(m: Int, ksub: Int, iters: Int, dim: Int, nq: Int, k: Int): String =
    s"""WITH ${pqCtes(m, ksub, iters, dim, nq)},
       |ranked AS (
       |  SELECT q_id, vec_id, adc,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
       |  FROM (SELECT q.q_id, c.vec_id, ${pqAdcSum(m)} AS adc
       |        FROM codes c CROSS JOIN luts q WHERE c.vec_id != q.q_id)
       |)
       |SELECT q_id, vec_id, rank, floor(adc * 1e4 + 0.5) / 1e4 AS adc_dist
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Replays Pq.adcCosineTopK: dot LUTs + the shared per-centroid norm²
    * table (block orthogonality: ‖x̂‖² = Σ_j ‖c_j‖²) + query norms, on top
    * of the [[pqCtes]] fit/encode chain.
    */
  private def pqCosOracle(m: Int, ksub: Int, iters: Int, dim: Int, nq: Int, k: Int): String = {
    val sub = dim / m
    val blocks = 0 until m
    val dotCtes = blocks.map { j =>
      s"""ld$j AS (SELECT vec_id AS q_id,
         |  [list_reduce([v[i] * cc[i] for i in range(1, $sub + 1)], (a, b) -> a + b) for cc in cs] AS lut
         |  FROM e$j CROSS JOIN c${iters}_$j WHERE vec_id < $nq),
         |nt$j AS (SELECT
         |  [list_reduce([cc[i] * cc[i] for i in range(1, $sub + 1)], (a, b) -> a + b) for cc in cs] AS n2
         |  FROM c${iters}_$j)""".stripMargin
    }.mkString(",\n")
    val dlutJoins = blocks.tail.map(j => s"JOIN ld$j USING (q_id)").mkString(" ")
    val num = blocks.map(j => s"q.dlut$j[CAST(c.codes[${j + 1}] AS INT) + 1]").mkString(" + ")
    val den2 = blocks.map(j => s"nt$j.n2[CAST(c.codes[${j + 1}] AS INT) + 1]").mkString(" + ")
    val ntJoins = blocks.map(j => s"CROSS JOIN nt$j").mkString(" ")
    s"""WITH ${pqCtes(m, ksub, iters, dim, nq)},
       |$dotCtes,
       |lds AS (SELECT q_id, ${blocks.map(j => s"ld$j.lut AS dlut$j").mkString(", ")}
       |        FROM ld0 $dlutJoins),
       |qn AS (SELECT vec_id AS q_id,
       |         sqrt(list_reduce([x * x for x in ev], (a, b) -> a + b)) AS qnorm
       |       FROM e0all WHERE vec_id < $nq),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM (SELECT q.q_id, c.vec_id,
       |               ($num) / (qn.qnorm * sqrt($den2)) AS cos
       |        FROM codes c CROSS JOIN lds q $ntJoins
       |        JOIN qn ON qn.q_id = q.q_id
       |        WHERE c.vec_id != q.q_id)
       |)
       |SELECT q_id, vec_id, rank, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Replays the RESIDUAL IVFPQ chain: coarse fit → residual frame
    * (v − centroid(bucket), exact elementwise) → per-block codebooks fit
    * over residual slices → residual codes → probe ranking → per-(query,
    * probed-cell) residual LUTs → ADC ranking.
    */
  private def ivfpqResidualOracle(nCells: Int, iters: Int, m: Int, ksub: Int,
      pqIters: Int, dim: Int, nq: Int, nprobe: Int, k: Int): String = {
    val sub = dim / m
    val blocks = 0 until m
    val qlCtes = blocks.map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      s"""ql$j AS (SELECT q_id, bucket,
         |  [list_reduce([((qr[$lo:$hi])[i] - cc[i]) * ((qr[$lo:$hi])[i] - cc[i]) for i in range(1, $sub + 1)],
         |    (a, b) -> a + b) for cc in cs] AS lut
         |  FROM qres CROSS JOIN c${pqIters}_$j)""".stripMargin
    }.mkString(",\n")
    val qlJoins = blocks.tail.map(j => s"JOIN ql$j USING (q_id, bucket)").mkString(" ")
    val adcSum = blocks.map(j => s"q.lut$j[CAST(c.codes[${j + 1}] AS INT) + 1]").mkString(" + ")
    s"""WITH ${kmeansCtes(nCells, iters, dim)},
       |cc AS (SELECT vec_id, list_indexof(ds, list_min(ds)) - 1 AS bucket FROM asg),
       |rf AS (SELECT a.vec_id,
       |         [a.v[i] - (cs[CAST(b.bucket AS INT) + 1])[i] for i in range(1, $dim + 1)] AS rv
       |       FROM asg a JOIN cc b USING (vec_id) CROSS JOIN c$iters),
       |${pqCtes(m, ksub, pqIters, dim, nq, src = "rf", vecExpr = "rv", withLuts = false)},
       |pr AS (
       |  SELECT q_id, bucket FROM (
       |    SELECT a.vec_id AS q_id, r.cell AS bucket,
       |           row_number() OVER (PARTITION BY a.vec_id
       |                              ORDER BY a.ds[CAST(r.cell AS INT) + 1], r.cell) AS prn
       |    FROM asg a CROSS JOIN range(0, $nCells) r(cell)
       |    WHERE a.vec_id < $nq
       |  ) WHERE prn <= $nprobe
       |),
       |qres AS (SELECT a.vec_id AS q_id, p.bucket,
       |           [a.v[i] - (cs[CAST(p.bucket AS INT) + 1])[i] for i in range(1, $dim + 1)] AS qr
       |         FROM asg a JOIN pr p ON a.vec_id = p.q_id CROSS JOIN c$iters),
       |$qlCtes,
       |qluts AS (SELECT q_id, bucket, ${blocks.map(j => s"ql$j.lut AS lut$j").mkString(", ")}
       |          FROM ql0 $qlJoins),
       |ranked AS (
       |  SELECT q_id, vec_id, adc,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
       |  FROM (SELECT q.q_id, c.vec_id, $adcSum AS adc
       |        FROM codes c
       |        JOIN cc ON cc.vec_id = c.vec_id
       |        JOIN qluts q ON cc.bucket = q.bucket
       |        WHERE c.vec_id != q.q_id)
       |)
       |SELECT q_id, vec_id, rank, floor(adc * 1e4 + 0.5) / 1e4 AS adc_dist
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** [[kmeansCtes]] (coarse cells) + [[pqCtes]] (codes/LUTs) + the probe
    * ranking of the at-rest IVF oracle + ADC ranking within probed cells —
    * the full IVFPQ chain replayed.
    */
  private def ivfpqOracle(nCells: Int, iters: Int, m: Int, ksub: Int, pqIters: Int,
      dim: Int, nq: Int, nprobe: Int, k: Int): String =
    s"""WITH ${kmeansCtes(nCells, iters, dim)},
       |${pqCtes(m, ksub, pqIters, dim, nq)},
       |cc AS (SELECT vec_id, list_indexof(ds, list_min(ds)) - 1 AS bucket FROM asg),
       |pr AS (
       |  SELECT q_id, bucket FROM (
       |    SELECT a.vec_id AS q_id, r.cell AS bucket,
       |           row_number() OVER (PARTITION BY a.vec_id
       |                              ORDER BY a.ds[CAST(r.cell AS INT) + 1], r.cell) AS prn
       |    FROM asg a CROSS JOIN range(0, $nCells) r(cell)
       |    WHERE a.vec_id < $nq
       |  ) WHERE prn <= $nprobe
       |),
       |ranked AS (
       |  SELECT q_id, vec_id, adc,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
       |  FROM (SELECT q.q_id, c.vec_id, ${pqAdcSum(m)} AS adc
       |        FROM codes c
       |        JOIN cc ON cc.vec_id = c.vec_id
       |        JOIN pr p ON cc.bucket = p.bucket
       |        JOIN luts q ON q.q_id = p.q_id
       |        WHERE c.vec_id != p.q_id)
       |)
       |SELECT q_id, vec_id, rank, floor(adc * 1e4 + 0.5) / 1e4 AS adc_dist
       |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  private def kmeansOracle(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)}
       |SELECT vec_id,
       |       CAST(list_indexof(ds, list_min(ds)) - 1 AS BIGINT) AS cluster,
       |       floor(list_min(ds) * 1e4 + 0.5) / 1e4 AS dist
       |FROM asg ORDER BY vec_id""".stripMargin

  private val annOracle =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
       |scored AS (
       |  SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos,
       |         row_number() OVER (PARTITION BY q_id ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
       |  FROM e CROSS JOIN q WHERE vec_id != q_id
       |)
       |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
       |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** annOracle in the 16-d signed-random-projection space: the sign
    * matrix is rebuilt from the same md5 digests Projection derives it
    * from, the projection uses the same left-to-right fold, and the
    * cosine/rank chain is unchanged.
    */
  private val rpOracle = {
    val signSql =
      "CASE WHEN CAST(concat('0x', substr(md5('rp7:' || j || ':' || i), 1, 15)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    s"""WITH $embCte,
       |sm AS (
       |  SELECT j, list($signSql ORDER BY i) AS sr
       |  FROM range(0, 16) t1(j) CROSS JOIN range(0, 64) t2(i) GROUP BY j
       |),
       |p AS (
       |  SELECT vec_id, list(${dotSql("e.v", "sm.sr")} ORDER BY sm.j) AS v
       |  FROM e CROSS JOIN sm GROUP BY vec_id
       |),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM p WHERE vec_id < 10),
       |scored AS (
       |  SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos,
       |         row_number() OVER (PARTITION BY q_id ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
       |  FROM p CROSS JOIN q WHERE vec_id != q_id
       |)
       |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
       |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** BM25 top-20 for the fixed 3-term query — shared by the direct
    * (`q_pl_bm25`) and at-rest-index (`q_pl_bm25_idx`) gates: both
    * routes must reproduce this ranking exactly.
    */
  private val bm25Oracle =
    s"""WITH $wordsCte,
       |wl AS (SELECT doc_id, CAST(len([x for x in w if length(x) > 0]) AS DOUBLE) AS dl FROM words),
       |st AS (SELECT floor(avg(dl) * 1e6 + 0.5) / 1e6 AS avgdl,
       |              (SELECT count(*) FROM documents) AS nd FROM wl),
       |tok AS (SELECT doc_id, unnest(w) AS term FROM words),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
       |       WHERE term IN ('spark', 'hash', 'merge') GROUP BY 1, 2),
       |dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT tf.doc_id,
       |         sum(ln(1.0 + (st.nd - dfx.df + 0.5) / (dfx.df + 0.5))
       |             * tf.tf * 2.2
       |             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * wl.dl / st.avgdl))) AS s
       |  FROM tf JOIN dfx USING (term) JOIN wl USING (doc_id) CROSS JOIN st
       |  GROUP BY 1
       |), r AS (
       |  SELECT doc_id,
       |         row_number() OVER (ORDER BY floor(s * 1e4 + 0.5) / 1e4 DESC, doc_id) AS rank,
       |         floor(s * 1e4 + 0.5) / 1e4 AS score
       |  FROM sc
       |)
       |SELECT doc_id, rank, score FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** Round-3 ops timed by Bench outside the baseline-comparable total;
    * validated against the registry below so a rename can't silently drop
    * an op from the regression watch.
    */
  private val ExtraBench = Set(
    "q_pl_dup_clusters", "q_pl_decontam", "q_pl_cap", "q_pl_pack",
    "q_pl_repetition", "q_pl_quant", "q_pl_chunk_text", "q_pl_sessions",
    // the two banded-join ops — the declared 100 TB paths — plus the
    // quantized ANN serving path, so all have per-op timing history
    "q_pl_simhash", "q_pl_cos_pairs_lsh", "q_ann_quant", "q_pl_kmeans",
    "q_pl_vocab", "q_pl_lm_score", "q_pl_tfidf", "q_ann_ivf_km",
    "q_pl_cluster_balance", "q_ann_ivf_at_rest", "q_ann_pq", "q_ann_ivfpq_at_rest",
    "q_pl_span_dedup", "q_ann_pq_cos", "q_ann_ivfpq_residual", "q_pl_mixture",
    "q_pl_curation_chain", "q_ann_self_join", "q_pl_bm25", "q_pl_weighted_sample",
    "q_ann_rp", "q_pl_temperature", "q_pl_ppl_buckets",
    // round-9 additions
    "q_ann_hamming", "q_pl_hard_negatives", "q_pl_semdedup",
    "q_pl_lm_bigram", "q_pl_rrf",
    // round-8 continuation. (q_ann_mutual_nn — the exact Θ(n²) oracle
    // twin — was demoted from the sf0.1 extras in r10: it is ground-truth
    // eval, not a serving path; the gated scale route q_ann_mutual_nn_idx
    // keeps the per-op timing watch. Same for q_ann_recall_curve, whose
    // exact brute arm is 3× the corpus by construction. Both remain full
    // correctness gates at every SF. See BASELINE.md "r10 extras demotion".)
    "q_pl_pmi", "q_pl_centrality",
    // round-9: index-backed scale routes for the two r8 weak grades, plus
    // q_ann_eval (gated in r8 but never benchmarked — ADVICE)
    "q_ann_mutual_nn_idx", "q_pl_centrality_knn", "q_ann_eval",
    // round-9: sketch/blocked/at-rest dedup additions
    "q_pl_heavy_hitters", "q_pl_edit_dist", "q_pl_incr_dedup",
    "q_pl_communities", "q_pl_bpe", "q_pl_bpe_apply",
    // round-9 continuation: drift/quality screens, bloom decontam,
    // Matryoshka eval
    "q_pl_decontam_bloom", "q_pl_ks_drift", "q_pl_zipf", "q_pl_readability",
    "q_ann_matryoshka", "q_pl_whiten", "q_pl_pca", "q_pl_minhash_est",
    "q_pl_dup_clusters_star", "q_pl_silhouette",
    // round-10
    "q_pl_cms", "q_pl_neyman", "q_pl_bm25_idx", "q_pl_grid_dbscan",
    "q_pl_triangles", "q_pl_ppr", "q_pl_containment",
    // round-11
    "q_ann_knn_graph", "q_pl_bm25_probe", "q_pl_centrality_banded",
    "q_pl_quality_clf", "q_pl_leakage_split", "q_pl_shards",
    "q_pl_winsorize",
    // round-11 continuation
    "q_pl_modularity", "q_dq_wasserstein", "q_dq_jsd")

  def qs: Seq[Q] = {
    val all = raw.map(q => if (ExtraBench(q.name)) q.copy(benchExtra = true) else q)
    val missing = ExtraBench -- all.map(_.name).toSet
    require(missing.isEmpty, s"ExtraBench names not in registry: ${missing.mkString(", ")}")
    all
  }

  private def raw: Seq[Q] = Seq(

    Q("q_pl_token_stats",
      (s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $wordsCte
              |SELECT doc_id, length(text) AS n_chars, len(w) AS n_words,
              |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
              |       floor((length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / len(w)) * 1e4 + 0.5) / 1e4 AS avg_word_len
              |FROM words ORDER BY doc_id""".stripMargin),
      bench = true),

    // Unigram entropy (nats) — the repetitiveness quality signal: low
    // entropy = boilerplate/degenerate text. Integer-count ln folds only
    // (H = ln n − Σ c·ln c / n), so both engines compute identical
    // floats from identical integers.
    Q("q_pl_entropy",
      (s, dir) => TextAnalysis.tokenEntropy(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $wordsCte,
              |t AS (SELECT doc_id, unnest(w) AS word FROM words),
              |c AS (SELECT doc_id, word, count(*) AS c FROM t GROUP BY 1, 2),
              |e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
              |             sum(c * ln(c)) AS s FROM c GROUP BY 1)
              |SELECT doc_id, n_words,
              |       floor((ln(n_words) - s / n_words) * 1e4 + 0.5) / 1e4 AS entropy
              |FROM e ORDER BY doc_id""".stripMargin),
      benchExtra = true),

    Q("q_pl_lang_id",
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $wordsCte, $langScoredCte
              |SELECT doc_id, ${TextAnalysis.Lexicons.map(l => s"score_${l._1}").mkString(", ")}, $langCaseSql AS pred_lang
              |FROM scored ORDER BY doc_id""".stripMargin)),

    Q("q_pl_quality",
      (s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir)).orderBy("doc_id"),
      Some {
        val stop = TextAnalysis.Lexicons.flatMap(_._2).distinct.map(x => s"'$x'").mkString(",")
        s"""WITH $wordsCte
           |SELECT doc_id,
           |       floor((least(len(w) / 100.0, 1.0) * 0.3
           |           + least((len([x for x in w if x IN ($stop)]) * 1.0 / len(w)) * 5.0, 1.0) * 0.3
           |           + (1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / length(text)) * 10.0, 1.0)) * 0.2
           |           + least((length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / len(w)) / 8.0, 1.0) * 0.2) * 1e4 + 0.5) / 1e4 AS quality
           |FROM words ORDER BY doc_id""".stripMargin
      }),

    Q("q_pl_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $wordsCte, $shinglesCte
              |SELECT doc_id, array_to_string(hs[1:5], '-') AS fp
              |FROM sh ORDER BY doc_id""".stripMargin)),

    Q("q_pl_dedup_exact",
      (s, dir) => Dedup.exact(Tables.documents(s, dir)).orderBy("keep_id"),
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS digest,
             |       min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    // Cross-doc 8-gram span dedup: per-doc fraction of rolling token spans
    // that occur in >= 2 documents (the exact-substring dedup signal,
    // hash-approximated). Both engines hash the identically-tokenized
    // joined span, so counts match exactly.
    Q("q_pl_span_dedup",
      (s, dir) => Dedup.spanDupStats(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $wordsCte, sp AS (
              |  SELECT doc_id,
              |         CAST(concat('0x', substr(md5(list_aggregate(w[i:i+7], 'string_agg', ' ')), 1, 15)) AS BIGINT) AS dg
              |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
              |        FROM words WHERE len(w) >= 8)
              |), d AS (
              |  SELECT dg, count(DISTINCT doc_id) AS nd FROM sp GROUP BY 1
              |), st AS (
              |  SELECT sp.doc_id, count(*) AS n_spans,
              |         CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
              |  FROM sp JOIN d USING (dg) GROUP BY sp.doc_id
              |)
              |SELECT doc_id, coalesce(n_spans, 0) AS n_spans,
              |       coalesce(n_dup_spans, 0) AS n_dup_spans,
              |       floor((CASE WHEN coalesce(n_spans, 0) = 0 THEN 0.0
              |              ELSE n_dup_spans * 1.0 / n_spans END) * 1e4 + 0.5) / 1e4 AS dup_span_frac
              |FROM documents LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("q_pl_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir), 0.8)
        .orderBy("doc_a", "doc_b"),
      Some(jaccardOracle),
      bench = true),

    // Asymmetric containment pairs (r10): |A∩B|/|A| ≥ 0.7 with A the
    // smaller shingle set — the inclusion detector (quoted benchmark
    // questions, lifted paragraphs) Jaccard misses because the union
    // washes the small side out. One-sided PPJoin prefix candidates,
    // exact intersection verify; the oracle replays prefix, orientation
    // and intersection count identically.
    Q("q_pl_containment",
      (s, dir) => Dedup.containmentPairs(Tables.documents(s, dir), 0.7)
        .orderBy("doc_inner", "doc_outer"),
      Some(s"""WITH $wordsCte, $shinglesCte,
              |sz AS (SELECT doc_id, len(hs) AS n FROM sh),
              |cpx AS (
              |  SELECT doc_id, len(hs) AS n,
              |         unnest(hs[1 : len(hs) - CAST(ceil(0.7 * len(hs)) AS INT) + 1]) AS h
              |  FROM sh),
              |fx AS (SELECT doc_id, len(hs) AS n, unnest(hs) AS h FROM sh),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS doc_inner, b.doc_id AS doc_outer
              |  FROM cpx a JOIN fx b ON a.h = b.h
              |  WHERE (a.n, a.doc_id) < (b.n, b.doc_id)),
              |inter AS (
              |  SELECT c.doc_inner, c.doc_outer, count(*) AS i
              |  FROM cand c
              |  JOIN fx xa ON xa.doc_id = c.doc_inner
              |  JOIN fx xb ON xb.doc_id = c.doc_outer AND xa.h = xb.h
              |  GROUP BY 1, 2)
              |SELECT doc_inner, doc_outer,
              |       floor(i * 1.0 / sa.n * 1e4 + 0.5) / 1e4 AS containment
              |FROM inter JOIN sz sa ON doc_inner = sa.doc_id
              |WHERE floor(i * 1.0 / sa.n * 1e4 + 0.5) / 1e4 >= 0.7
              |ORDER BY doc_inner, doc_outer""".stripMargin)),

    // Same verified-pair output as above; candidate generation goes through
    // minhash signatures + LSH banding (the 100 TB path).
    Q("q_pl_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), 0.8)
        .orderBy("doc_a", "doc_b"),
      Some(jaccardOracle),
      bench = true),

    // Sketch calibration: signature-agreement Jaccard estimate vs the
    // exact value on the verified pairs — the oracle replays the FULL
    // coefficient schedule ((a_i·h + b_i) mod P minima), pinning the
    // codegen kernel's arithmetic across engines.
    Q("q_pl_minhash_est",
      (s, dir) => Dedup.minhashEstimate(Tables.documents(s, dir), 0.8)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $wordsCte, $shinglesCte, $verifiedPairsCte,
              |mh AS (
              |  SELECT doc_id,
              |         [list_min([((1 + ((i * 2654435761 + 104729) % 2147483646)) * h
              |                     + ((i * 40503 + 15485863) % 2147483647)) % 2147483647
              |                    for h in hs])
              |          for i in range(0, 32)] AS sig
              |  FROM sh),
              |est AS (
              |  SELECT vp.doc_a, vp.doc_b, vp.jaccard,
              |         floor((list_reduce(
              |             [CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
              |              for i in range(1, 33)],
              |             (x, y) -> x + y) / 32.0) * 1e4 + 0.5) / 1e4 AS est
              |  FROM vp JOIN mh a ON vp.doc_a = a.doc_id
              |          JOIN mh b ON vp.doc_b = b.doc_id)
              |SELECT doc_a, doc_b, jaccard, est,
              |       floor(abs(jaccard - est) * 1e4 + 0.5) / 1e4 AS abs_err
              |FROM est ORDER BY doc_a, doc_b""".stripMargin)),

    Q("q_pl_simhash",
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), 10)
        .orderBy("doc_a", "doc_b"),
      Some {
        val h60 = "CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)"
        s"""WITH $wordsCte, hv AS (
           |  SELECT doc_id, [$h60 for x in w] AS hs FROM words
           |), sim AS (
           |  SELECT doc_id, CAST(list_sum(
           |    [CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0
           |          THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
           |     for b in range(0, 60)]) AS BIGINT) AS sh
           |  FROM hv
           |)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
           |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sh, b.sh)) <= 10
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    Q("q_pl_cos_pairs",
      (s, dir) => Similarity.cosinePairs(Tables.embeddings(s, dir), 0.45)
        .orderBy("vec_a", "vec_b"),
      Some(s"""WITH $embCte
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |       floor((${cosSql("a.v", "b.v")}) * 1e6 + 0.5) / 1e6 AS cos
              |FROM e a JOIN e b ON a.vec_id < b.vec_id
              |WHERE ${cosSql("a.v", "b.v")} >= 0.45
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // Sub-quadratic twin of q_pl_cos_pairs: sign-bit LSH banding generates
    // candidates via an equi-join (the 100 TB path); exact cosine verifies
    // each. The *algorithm* is the contract (like q_pl_simhash): the oracle
    // mirrors the hyperplanes, sign bits, and 4-bit bands deterministically.
    Q("q_pl_cos_pairs_lsh",
      (s, dir) => Similarity.cosinePairsLsh(Tables.embeddings(s, dir), 0.45)
        .orderBy("vec_a", "vec_b"),
      Some {
        // hyperplane(j)[d] = ((j*64+d) * 2654435761 % 1999) / 1999.0 - 0.5
        // (mirrors Similarity.hyperplane exactly — integer arithmetic)
        s"""WITH $embCte,
           |planes AS (
           |  SELECT j, [((j * 64 + d) * 2654435761 % 1999) / 1999.0 - 0.5
           |             for d in range(0, 64)] AS p
           |  FROM range(0, 16) t(j)
           |),
           |sigs AS (
           |  SELECT vec_id,
           |         CAST(sum(CASE WHEN ${dotSql("v", "p")} > 0
           |                       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig
           |  FROM e CROSS JOIN planes GROUP BY vec_id
           |),
           |bands AS (
           |  SELECT vec_id, b AS band, (sig >> (b * 4)) & 15 AS bval
           |  FROM sigs CROSS JOIN range(0, 4) t(b)
           |),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
           |)
           |SELECT vec_a, vec_b,
           |       floor((${cosSql("ea.v", "eb.v")}) * 1e6 + 0.5) / 1e6 AS cos
           |FROM cand JOIN e ea ON vec_a = ea.vec_id JOIN e eb ON vec_b = eb.vec_id
           |WHERE ${cosSql("ea.v", "eb.v")} >= 0.45
           |ORDER BY vec_a, vec_b""".stripMargin
      }),

    Q("q_ann_brute",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("q_id", "rank")
      },
      Some(annOracle),
      bench = true),

    // Brute-force top-k in the 16-d signed-random-projection space: the
    // JL dim-reduction path — 4× cheaper dot products than full-dim
    // brute force, the narrow no-shuffle projection riding the scan.
    // Exact in the reduced space, so the oracle replays it exactly
    // (recall vs the full space is pinned by the spec, not the gate).
    Q("q_ann_rp",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val red = graft.pipeline.Projection.reduce(emb, "embedding",
          dim = 64, outDim = 16, salt = "rp7")
        Similarity.bruteForceTopK(red, red.filter(col("vec_id") < 10), 5)
          .orderBy("q_id", "rank")
      },
      Some(rpOracle)),

    // nprobe = all buckets ⇒ exact (same oracle); smaller nprobe is the
    // recall/scan tradeoff knob.
    Q("q_ann_ivf",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("q_id", "rank")
      },
      Some(annOracle)),

    // FAISS-style IVF: k-means coarse quantizer (data-dependent Voronoi
    // cells) instead of hyperplane sign bits; nprobe = all cells ⇒ exact,
    // so the brute-force oracle applies regardless of the learned cells.
    Q("q_ann_ivf_km",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // serving shape: fit the coarse quantizer ONCE, then probe with the
        // precomputed centroids (re-fitting per query was the r4 scale flag)
        val cs = graft.pipeline.Clustering.fitCentroids(emb, 16, 3)
        Similarity.kmeansIvfTopK(emb, emb.filter(col("vec_id") < 10), 5,
            centroids = Some(cs))
          .orderBy("q_id", "rank")
      },
      Some(annOracle)),

    // The index AT REST: corpus written as parquet partitioned by its
    // coarse-quantizer cell, probes served back from the pruned partitions
    // (nprobe=4 of 8 cells — a REAL pruned read, not the exact mode). The
    // oracle replays the whole chain: kmeans fit (kmeansCtes), corpus cell
    // assignment, per-query probe ranking (distance then lower cell), then
    // exact cosine top-k within the probed cells. PlanSpec asserts the
    // probe scan carries bucket PartitionFilters.
    Q("q_ann_ivf_at_rest",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = java.nio.file.Files.createTempDirectory("graft-gate-ivf").toString + "/index"
        val cs = graft.pipeline.IvfIndex.build(emb, idx, nCells = 8, iters = 3)
        graft.pipeline.IvfIndex.topK(s, idx, emb.filter(col("vec_id") < 10), 5,
            nprobe = 4, centroids = Some(cs))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH ${kmeansCtes(k = 8, iters = 3, dim = 64)},
              |cc AS (SELECT vec_id, v, list_indexof(ds, list_min(ds)) - 1 AS bucket FROM asg),
              |pr AS (
              |  SELECT q_id, qv, bucket FROM (
              |    SELECT a.vec_id AS q_id, a.v AS qv, r.cell AS bucket,
              |           row_number() OVER (PARTITION BY a.vec_id
              |                              ORDER BY a.ds[CAST(r.cell AS INT) + 1], r.cell) AS prn
              |    FROM asg a CROSS JOIN range(0, 8) r(cell)
              |    WHERE a.vec_id < 10
              |  ) WHERE prn <= 4
              |),
              |scored AS (
              |  SELECT p.q_id, c.vec_id, ${cosSql("p.qv", "c.v")} AS cos,
              |         row_number() OVER (PARTITION BY p.q_id
              |                            ORDER BY ${cosSql("p.qv", "c.v")} DESC, c.vec_id) AS rank
              |  FROM cc c JOIN pr p ON c.bucket = p.bucket AND c.vec_id != p.q_id
              |)
              |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
              |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // SEMANTIC DEDUP AT SCALE: the corpus itself is the query batch —
    // every vector finds its 3 nearest neighbors through the at-rest IVF
    // index. The serving guard refuses the driver collect for such a
    // batch and routes through the fully distributed probe path
    // (maxDriverBatch = 0 forces the route here so the gate exercises it
    // at sf0.01 scale; the default 10k threshold routes any real
    // corpus-sized batch identically). The only driver state is the
    // ≤ nCells distinct-bucket list. Oracle replays the same chain with
    // every vector as a query.
    Q("q_ann_self_join",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = java.nio.file.Files.createTempDirectory("graft-gate-selfj").toString + "/index"
        val cs = graft.pipeline.IvfIndex.build(emb, idx, nCells = 8, iters = 3)
        graft.pipeline.IvfIndex.topK(s, idx, emb, 3, nprobe = 4,
            centroids = Some(cs), maxDriverBatch = 0)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH ${kmeansCtes(k = 8, iters = 3, dim = 64)},
              |cc AS (SELECT vec_id, v, list_indexof(ds, list_min(ds)) - 1 AS bucket FROM asg),
              |pr AS (
              |  SELECT q_id, qv, bucket FROM (
              |    SELECT a.vec_id AS q_id, a.v AS qv, r.cell AS bucket,
              |           row_number() OVER (PARTITION BY a.vec_id
              |                              ORDER BY a.ds[CAST(r.cell AS INT) + 1], r.cell) AS prn
              |    FROM asg a CROSS JOIN range(0, 8) r(cell)
              |  ) WHERE prn <= 4
              |),
              |scored AS (
              |  SELECT p.q_id, c.vec_id, ${cosSql("p.qv", "c.v")} AS cos,
              |         row_number() OVER (PARTITION BY p.q_id
              |                            ORDER BY ${cosSql("p.qv", "c.v")} DESC, c.vec_id) AS rank
              |  FROM cc c JOIN pr p ON c.bucket = p.bucket AND c.vec_id != p.q_id
              |)
              |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
              |FROM scored WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // Asymmetric int8-quantized serving path: full-precision queries vs
    // reconstructed (qmin + code·qscale) corpus. Deterministic, so the
    // oracle replays the quantization (rounded qmin/qscale exactly as
    // Similarity.quantize emits them) and reproduces the ranking bit-for-bit.
    Q("q_ann_quant",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $embCte, q0 AS (
              |  SELECT vec_id, v, list_min(v) AS mn,
              |         CASE WHEN list_max(v) = list_min(v) THEN 1.0
              |              ELSE (list_max(v) - list_min(v)) / 255.0 END AS sc
              |  FROM e
              |), cq AS (
              |  SELECT vec_id,
              |         floor(mn * 1e6 + 0.5) / 1e6 AS qmin,
              |         floor(sc * 1e6 + 0.5) / 1e6 AS qscale,
              |         [CAST(floor((x - mn) / sc + 0.5) AS INTEGER) for x in v] AS codes
              |  FROM q0
              |), r AS (
              |  SELECT vec_id,
              |         [qmin + codes[i] * qscale for i in range(1, len(codes) + 1)] AS v
              |  FROM cq
              |), q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
              |scored AS (
              |  SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos,
              |         row_number() OVER (PARTITION BY q_id ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
              |  FROM r CROSS JOIN q WHERE vec_id != q_id
              |)
              |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
              |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Product quantization (FAISS IVFPQ's memory path): 64-dim vectors →
    // 4 one-byte codes (one 16-centroid codebook per 16-dim block), served
    // by asymmetric-distance lookup — 4 table probes per candidate instead
    // of a 64-element fold, and the at-rest corpus is 4 bytes/vector. The
    // oracle replays fit, encode, and the ADC ranking bit-for-bit.
    Q("q_ann_pq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val books = graft.pipeline.Pq.fit(emb, m = 4, ksub = 16, iters = 1)
        graft.pipeline.Pq.adcTopK(emb, emb.filter(col("vec_id") < 10), books, k = 5)
          .orderBy("q_id", "rank")
      },
      Some(pqOracle(m = 4, ksub = 16, iters = 1, dim = 64, nq = 10, k = 5))),

    // OPQ-rotated PQ (r12, Ge et al. CVPR 2013): the frozen trained
    // rotation (OPQ_ROTATION.txt — tools.OpqFit checkpoint, the pattern
    // a production rotation ships as) applied before the identical fit/
    // encode/ADC chain. Zero serving-path change: still m codes + m table
    // probes per candidate; rotation costs one plan-literal matrix apply
    // at encode/query time. PipelineSpec pins the anisotropic recall lift
    // (0.180 -> 0.344 @5) and orthogonality; the near-uniform gate corpus
    // measures parity (BASELINE.md) — OPQ has nothing to exploit there,
    // by theory.
    Q("q_ann_opq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val rot = graft.pipeline.Pq.rotate(emb, opqRotation)
        val books = graft.pipeline.Pq.fit(rot, m = 4, ksub = 16, iters = 1)
        graft.pipeline.Pq.adcTopK(rot, rot.filter(col("vec_id") < 10), books, k = 5)
          .orderBy("q_id", "rank")
      },
      Some(opqOracle(opqRotation, m = 4, ksub = 16, iters = 1, dim = 64, nq = 10, k = 5)),
      benchExtra = true),

    // COSINE-metric ADC over the same codes: aligns PQ serving with the
    // cosine contract of the rest of the ANN family; the reconstruction
    // norm comes from the shared norm² table (block orthogonality), so
    // nothing beyond the m codes is read per candidate.
    Q("q_ann_pq_cos",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val books = graft.pipeline.Pq.fit(emb, m = 4, ksub = 16, iters = 1)
        graft.pipeline.Pq.adcCosineTopK(emb, emb.filter(col("vec_id") < 10), books, k = 5)
          .orderBy("q_id", "rank")
      },
      Some(pqCosOracle(m = 4, ksub = 16, iters = 1, dim = 64, nq = 10, k = 5))),

    // The full IVFPQ composition AT REST: cells partition the parquet, rows
    // store ONLY the m PQ codes (no raw vectors in the index), probes prune
    // at the partition index (nprobe=4 of 8) and rank by ADC over the
    // stored codes. The oracle replays the entire chain: coarse fit, PQ
    // fit, encoding, probe ranking, ADC. PlanSpec asserts the probe scan
    // prunes partitions AND reads no vector column.
    Q("q_ann_ivfpq_at_rest",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = java.nio.file.Files.createTempDirectory("graft-gate-ivfpq").toString + "/index"
        val (cs, books) = graft.pipeline.IvfIndex.buildPq(emb, idx, nCells = 8, iters = 3,
          m = 4, ksub = 16, pqIters = 1)
        graft.pipeline.IvfIndex.topKPq(s, idx, emb.filter(col("vec_id") < 10), 5,
            nprobe = 4, centroids = Some(cs), books = Some(books))
          .orderBy("q_id", "rank")
      },
      Some(ivfpqOracle(nCells = 8, iters = 3, m = 4, ksub = 16, pqIters = 1,
        dim = 64, nq = 10, nprobe = 4, k = 5))),

    // RESIDUAL IVFPQ (FAISS IndexIVFPQ proper): codebooks fit and codes
    // quantize v − coarseCentroid(cell); serving uses per-(query, probed
    // cell) LUTs. The oracle replays the full residual chain.
    Q("q_ann_ivfpq_residual",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = java.nio.file.Files.createTempDirectory("graft-gate-ivfpqr").toString + "/index"
        val (cs, books) = graft.pipeline.IvfIndex.buildPq(emb, idx, nCells = 8, iters = 3,
          m = 4, ksub = 16, pqIters = 1, residual = true)
        graft.pipeline.IvfIndex.topKPqResidual(s, idx, emb.filter(col("vec_id") < 10), 5,
            nprobe = 4, cs, books)
          .orderBy("q_id", "rank")
      },
      Some(ivfpqResidualOracle(nCells = 8, iters = 3, m = 4, ksub = 16, pqIters = 1,
        dim = 64, nq = 10, nprobe = 4, k = 5))),

    // Corpus vocabulary by document frequency (vocab building / stopword
    // discovery): per-doc distinct → explode → word-level count → top-100.
    Q("q_pl_vocab",
      (s, dir) => TextAnalysis.vocabTopK(Tables.documents(s, dir), 100),
      Some(s"""WITH $wordsCte,
              |x AS (SELECT doc_id, unnest(list_distinct(w)) AS word FROM words)
              |SELECT word, count(*) AS doc_freq FROM x WHERE length(word) > 0
              |GROUP BY word ORDER BY doc_freq DESC, word LIMIT 100""".stripMargin)),

    // Cluster-balanced (diversity) sampling: kmeans cells as strata, the
    // skew-proof per-stratum cap keeps a deterministic uniform draw of 30
    // vectors per cell — two gated operators composed, oracle end-to-end.
    Q("q_pl_cluster_balance",
      (s, dir) => {
        val cl = graft.pipeline.Clustering.kmeans(Tables.embeddings(s, dir), k = 8, iters = 3)
          .select(col("vec_id"), col("cluster"))
        Sampling.capPerStratum(cl, "vec_id", "cluster", 30, "bal4").orderBy("vec_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('bal4:' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH ${kmeansCtes(k = 8, iters = 3, dim = 64)},
           |a AS (SELECT vec_id, CAST(list_indexof(ds, list_min(ds)) - 1 AS BIGINT) AS cluster FROM asg),
           |r AS (
           |  SELECT vec_id, cluster,
           |         row_number() OVER (PARTITION BY cluster ORDER BY $h, vec_id) AS rn
           |  FROM a
           |)
           |SELECT vec_id, cluster FROM r WHERE rn <= 30 ORDER BY vec_id""".stripMargin
      }),

    // BM25 retrieval: top-20 documents for a fixed 3-term query —
    // retrieval-based quality filtering / decontamination-by-retrieval.
    // Query terms prune the token explode before any shuffle; df and
    // avgdl are broadcast scalars; top-k via TakeOrderedAndProject. The
    // oracle replays idf smoothing, length norm (1e-6-rounded avgdl),
    // and the (score desc, doc_id) ranking exactly.
    Q("q_pl_bm25",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.bm25TopK(docs, Seq("spark", "hash", "merge"), docs.count(), 20)
          .orderBy("rank")
      },
      Some(bm25Oracle)),

    // BM25 from the AT-REST inverted index (r10): build the term-bucket-
    // partitioned postings (denormalized tf/dl/df per row), probe with
    // the same query — partition pruning reads only the query terms'
    // buckets (PlanSpec-asserted), zero joins at probe time. SAME oracle
    // as q_pl_bm25: the index route must reproduce the direct ranking
    // bit for bit.
    Q("q_pl_bm25_idx",
      (s, dir) => {
        // fixed per-SF path under target/ (overwritten per invocation —
        // no /tmp leak across verify/bench rounds)
        val idx = s"target/gate-tmp/tix-${dir.replace('/', '_')}/i"
        graft.pipeline.TextIndex.build(Tables.documents(s, dir), idx)
        graft.pipeline.TextIndex.topK(s, idx, Seq("spark", "hash", "merge"), 20)
          .orderBy("rank")
      },
      Some(bm25Oracle)),

    // Probe-ONLY serving bracket (r11): reuse the at-rest index if one
    // already exists for this corpus (CONTENT-fingerprint keyed, r12 —
    // bit_xor of xxhash64(doc_id, n_chars): a regenerated corpus with the
    // same row count but different rows forces a rebuild; count alone
    // silently probed a stale index), so bench timings after the first
    // build measure the partition-pruned probe alone — the only number
    // that matters for the 100 TB serving claim. Correctness is
    // unchanged: same oracle as the direct route.
    Q("q_pl_bm25_probe",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val n = java.lang.Long.toHexString(
          docs.select(xxhash64(col("doc_id"), col("n_chars")).as("h"))
            .agg(expr("bit_xor(h)")).head.getLong(0))
        val idx = s"target/gate-tmp/tix-probe-${dir.replace('/', '_')}-n$n/i"
        val p = new org.apache.hadoop.fs.Path(s"$idx/meta")
        val fs = p.getFileSystem(s.sessionState.newHadoopConf())
        if (!fs.exists(p)) graft.pipeline.TextIndex.build(docs, idx)
        graft.pipeline.TextIndex.topK(s, idx, Seq("spark", "hash", "merge"), 20)
          .orderBy("rank")
      },
      Some(bm25Oracle)),

    // Per-doc top TF-IDF terms (keyword extraction), ranked on the rounded
    // score so cross-engine ln() ulps cannot flip near-ties.
    Q("q_pl_tfidf",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.tfIdfTopTerms(docs, docs.count(), 3).orderBy("doc_id", "rank")
      },
      Some(s"""WITH $wordsCte,
              |tok AS (SELECT doc_id, unnest(w) AS term FROM words),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
              |       WHERE length(term) > 0 GROUP BY 1, 2),
              |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |sc AS (
              |  SELECT doc_id, term,
              |         floor(tf * ln((SELECT count(*) FROM documents) * 1.0 / df) * 1e4 + 0.5) / 1e4 AS score
              |  FROM tf JOIN dfx USING (term)
              |), r AS (
              |  SELECT doc_id, term, score,
              |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
              |  FROM sc
              |)
              |SELECT doc_id, rank, term, score FROM r WHERE rank <= 3
              |ORDER BY doc_id, rank""".stripMargin)),

    // Unigram-surprisal quality scoring: per-doc mean -log2(df/N) over a
    // corpus-derived document-frequency dictionary (LM-rarity signal).
    Q("q_pl_lm_score",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.lmSurprisal(docs, docs.count()).orderBy("doc_id")
      },
      Some(s"""WITH $wordsCte,
              |tok AS (SELECT doc_id, unnest(w) AS word FROM words),
              |tok2 AS (SELECT doc_id, word FROM tok WHERE length(word) > 0),
              |dict AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY word),
              |sc AS (
              |  SELECT t.doc_id, count(*) AS n_tokens,
              |         floor(avg(-log2(df * 1.0 / (SELECT count(*) FROM documents))) * 1e4 + 0.5) / 1e4 AS surprisal
              |  FROM tok2 t JOIN dict USING (word) GROUP BY t.doc_id
              |)
              |SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens, sc.surprisal
              |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // CCNet-style perplexity bucketing: head/middle/tail at the score
    // terciles — cutoffs are exact percentiles of the ROUNDED surprisal,
    // re-rounded, assignment compares rounded-to-rounded.
    Q("q_pl_ppl_buckets",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.perplexityBuckets(
            TextAnalysis.lmSurprisal(docs, docs.count()))
          .select("doc_id", "surprisal", "ppl_bucket")
          .orderBy("doc_id")
      },
      Some(s"""WITH $wordsCte,
              |tok AS (SELECT doc_id, unnest(w) AS word FROM words),
              |tok2 AS (SELECT doc_id, word FROM tok WHERE length(word) > 0),
              |dict AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY word),
              |sc AS (
              |  SELECT t.doc_id,
              |         floor(avg(-log2(df * 1.0 / (SELECT count(*) FROM documents))) * 1e4 + 0.5) / 1e4 AS surprisal
              |  FROM tok2 t JOIN dict USING (word) GROUP BY t.doc_id
              |),
              |full_sc AS (SELECT d.doc_id, sc.surprisal
              |            FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
              |th AS (SELECT floor(quantile_cont(surprisal, 1.0/3) * 1e4 + 0.5) / 1e4 AS t1,
              |              floor(quantile_cont(surprisal, 2.0/3) * 1e4 + 0.5) / 1e4 AS t2
              |       FROM full_sc)
              |SELECT doc_id, surprisal,
              |       CASE WHEN surprisal IS NULL THEN 'empty'
              |            WHEN surprisal <= th.t1 THEN 'head'
              |            WHEN surprisal <= th.t2 THEN 'middle'
              |            ELSE 'tail' END AS ppl_bucket
              |FROM full_sc CROSS JOIN th ORDER BY doc_id""".stripMargin)),

    // Distributed k-means corpus clustering (Lloyd's, deterministic seeds,
    // 1e-4-rounded centroids): the topic-balancing / diversity-sampling /
    // IVF-coarse-quantizer primitive. One narrow pass + a k×dim aggregate
    // per iteration; only the centroid matrix reaches the driver.
    Q("q_pl_kmeans",
      (s, dir) => graft.pipeline.Clustering.kmeans(Tables.embeddings(s, dir), k = 8, iters = 3)
        .orderBy("vec_id"),
      Some(kmeansOracle(k = 8, iters = 3, dim = 64))),

    Q("q_multimodal_meta",
      (s, dir) => Multimodal.decodeMeta(s, Multimodal.mediaTable(Tables.documents(s, dir)))
        .toDF().orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CASE WHEN doc_id % 3 = 0 THEN 'image'
             |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             |       octet_length(encode(text)) AS n_bytes,
             |       md5(text) AS digest,
             |       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
             |       CAST(octet_length(encode(text)) * 7 % 480 AS INTEGER) AS height,
             |       CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 16 ELSE 1 END AS INTEGER) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Scrub + number normalization: cross-engine regex parity on the RE2-
    // compatible patterns (DuckDB needs the 'g' flag; Spark replaces all
    // by default).
    Q("q_pl_scrub",
      (s, dir) => TextAnalysis.scrub(Tables.documents(s, dir), maskNumbers = true)
        .select(col("doc_id"), md5(col("text")).as("digest"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id"),
      Some {
        // DuckDB single-quoted literals keep backslashes literal — embed
        // the RE2 patterns verbatim
        val scrubbed = "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, " +
          s"'${TextAnalysis.UrlPattern}', '<url>', 'g'), " +
          s"'${TextAnalysis.EmailPattern}', '<email>', 'g'), " +
          s"'${TextAnalysis.Ipv4Pattern}', '<ip>', 'g'), " +
          s"'${TextAnalysis.NumberPattern}', '<num>', 'g')"
        s"""SELECT doc_id, md5($scrubbed) AS digest, length($scrubbed) AS n_chars
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Frame sampling over video payloads: every 2nd 256-byte window,
    // hex-compared (Spark's base64 inserts MIME CRLF breaks; hex is
    // identical across engines; documents text is pure ASCII, so byte
    // offsets equal character offsets in the oracle's substr).
    Q("q_multimodal_frames",
      (s, dir) => Multimodal.frameSample(
          Multimodal.mediaTable(Tables.documents(s, dir)), frameBytes = 256, everyK = 2)
        .select(col("doc_id"), col("frame_idx"), hex(col("frame")).as("frame_hex"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |         CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS nf
             |  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0
             |), f AS (
             |  SELECT doc_id, unnest(range(0, nf)) AS frame_idx, text FROM m
             |)
             |SELECT doc_id, frame_idx,
             |       upper(hex(encode(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)))) AS frame_hex
             |FROM f WHERE frame_idx % 2 = 0
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // End-to-end multimodal serving (r11): the featurizer-grade embed
    // (byte-histogram × JL signed projection — REAL, no model stub)
    // feeds the ANN serving path; top-3 neighbors per query blob. The
    // oracle replays histogram, sign matrix (same md5-derived schedule
    // as rpOracle) and the exact cosine ranking. Closes the last
    // inventory row: the multimodal surface is gate-verified end to end.
    Q("q_multimodal_embed",
      (s, dir) => {
        val media = Multimodal.mediaTable(Tables.documents(s, dir))
        val emb = Multimodal.embed(s, media, dim = 16)
          .withColumnRenamed("doc_id", "vec_id")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), 3)
          .orderBy("q_id", "rank")
      },
      Some {
        val signSql =
          "CASE WHEN CAST(concat('0x', substr(md5('mm1:' || j || ':' || i), 1, 15)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END"
        s"""WITH mm AS (
           |  SELECT doc_id, text, octet_length(encode(text)) AS n
           |  FROM documents WHERE octet_length(encode(text)) > 0),
           |nib AS (
           |  SELECT doc_id, n, [ord(c) // 16 for c in string_split(text, '')] AS nibs FROM mm),
           |feat AS (
           |  SELECT doc_id AS vec_id,
           |         -- float4 round-trip pins Spark's Array[Float] storage,
           |         -- then widen to DOUBLE so the dot fold runs in double
           |         [CAST(CAST(CAST(len([x for x in nibs if x = b]) AS DOUBLE) / n AS REAL) AS DOUBLE) for b in range(0, 16)] AS fr
           |  FROM nib),
           |sm AS (
           |  SELECT j, list($signSql ORDER BY i) AS sr
           |  FROM range(0, 16) t1(j) CROSS JOIN range(0, 16) t2(i) GROUP BY j),
           |p AS (
           |  SELECT vec_id, list(${dotSql("feat.fr", "sm.sr")} ORDER BY sm.j) AS v
           |  FROM feat CROSS JOIN sm GROUP BY vec_id),
           |q AS (SELECT vec_id AS q_id, v AS qv FROM p WHERE vec_id < 8),
           |scored AS (
           |  SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos,
           |         row_number() OVER (PARTITION BY q_id ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
           |  FROM p CROSS JOIN q WHERE vec_id != q_id)
           |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
           |FROM scored WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // Gopher-style repetition filters: duplicate-line fraction, most-common
    // word-bigram share, duplicate-trigram fraction. Narrow per-doc arrays.
    Q("q_pl_repetition",
      (s, dir) => TextAnalysis.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $wordsCte, rep AS (
              |  SELECT doc_id,
              |         [x for x in [trim(l) for l in string_split(text, chr(10))] if length(x) > 0] AS lines,
              |         [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bg,
              |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)] AS tg
              |  FROM words
              |)
              |SELECT doc_id, len(lines) AS n_lines,
              |       CASE WHEN len(lines) = 0 THEN 0.0
              |            ELSE floor((len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) * 1e4 + 0.5) / 1e4 END AS dup_line_frac,
              |       CASE WHEN len(bg) = 0 THEN 0.0
              |            ELSE floor(list_max([len([y for y in bg if y = x]) for x in list_distinct(bg)]) * 1.0 / len(bg) * 1e4 + 0.5) / 1e4 END AS top_bigram_frac,
              |       CASE WHEN len(tg) = 0 THEN 0.0
              |            ELSE floor((len(tg) - len(list_distinct(tg))) * 1.0 / len(tg) * 1e4 + 0.5) / 1e4 END AS dup_trigram_frac
              |FROM rep ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified sampling: per-language keep rates decided by
    // a portable md5 hash of (salt, doc_id) — reproducible on any cluster
    // size and mirrored exactly by the oracle.
    // Deterministic weighted sample without replacement (Efraimidis–
    // Spirakis A-Res): top-100 by u^(1/w) on the salted-hash draw —
    // importance-weighted corpus thinning. Output is the selected SET
    // (membership only), so cross-engine pow() ulps would have to flip
    // an inclusion boundary to matter; the 1e6-quantized draw keeps
    // scores far apart.
    Q("q_pl_weighted_sample",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("wt", (col("doc_id") % 5 + 1).cast("double"))
        Sampling.weightedSample(docs, "doc_id", "wt", 100, "ws6")
          .select("doc_id", "source", "wt").orderBy("doc_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('ws6:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH d AS (SELECT doc_id, source, CAST(doc_id % 5 + 1 AS DOUBLE) AS wt FROM documents),
           |r AS (SELECT doc_id, source, wt,
           |             row_number() OVER (
           |               ORDER BY floor(pow(($h + 0.5) / 1e6, 1.0 / wt) * 1e9 + 0.5) / 1e9 DESC,
           |                        doc_id) AS rn
           |      FROM d)
           |SELECT doc_id, source, wt FROM r WHERE rn <= 100 ORDER BY doc_id""".stripMargin
      }),

    Q("q_pl_sample",
      (s, dir) => {
        val lang = TextAnalysis.langId(Tables.documents(s, dir))
          .select(col("doc_id"), col("pred_lang"))
        Sampling.stratified(lang, "doc_id", "pred_lang",
            Map("en" -> 0.8, "und" -> 0.2), 0.5, "r3")
          .orderBy("doc_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('r3:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH $wordsCte, $langScoredCte,
           |lang AS (SELECT doc_id, $langCaseSql AS pred_lang FROM scored)
           |SELECT doc_id, pred_lang FROM lang
           |WHERE $h < CASE WHEN pred_lang = 'en' THEN 800000
           |                WHEN pred_lang = 'und' THEN 200000 ELSE 500000 END
           |ORDER BY doc_id""".stripMargin
      }),

    // Benchmark decontamination: held-out set = doc_id % 20 = 0; every
    // remaining doc annotated with its 3-gram-hash overlap against it.
    Q("q_pl_decontam",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Decontam.contamination(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0), threshold = 0.5)
          .orderBy("doc_id")
      },
      Some(decontamOracle)),

    // Same decontamination through the bloom prefilter (distributed sketch
    // build + codegen might_contain ahead of the exact verify join) — the
    // movement-cheap shape when the benchmark n-gram set outgrows a raw
    // broadcast. The bloom admits false positives only and every survivor
    // is re-verified, so the SAME exact oracle applies — approximation in
    // the plan, exactness in the result.
    Q("q_pl_decontam_bloom",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Decontam.contaminationBloom(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0), threshold = 0.5)
          .orderBy("doc_id")
      },
      Some(decontamOracle)),

    // Centroid-silhouette clustering-quality screen over the ground-truth
    // labels: rounded per-dim centroids, exact left-fold distances — the
    // oracle replays both (the PCA/whiten determinism stances combined).
    // Grid-density clustering (r10): the no-k, noise-aware complement of
    // k-means — ⌊x/eps⌋ cells over embedding dims 1–2, core at minPts,
    // clusters = CC of the core-cell 8-adjacency graph (star
    // contraction; the oracle closes it with the recursive CTE),
    // deterministic border attach, NULL-cluster noise. Integer-exact
    // after the one engine-identical division.
    Q("q_pl_grid_dbscan",
      (s, dir) => graft.pipeline.Clustering.gridDensityClusters(
          Tables.embeddings(s, dir), eps = 0.15, minPts = 5)
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE pts AS (
             |  SELECT vec_id, CAST(floor(embedding[1] / 0.15) AS BIGINT) AS cx,
             |         CAST(floor(embedding[2] / 0.15) AS BIGINT) AS cy
             |  FROM embeddings
             |), cells AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY 1, 2),
             |core AS (SELECT cx, cy, (cx + 500000) * 1000000 + (cy + 500000) AS cid
             |         FROM cells WHERE n >= 5),
             |adj AS (
             |  SELECT a.cid AS s, b.cid AS d FROM core a JOIN core b
             |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.cid <> b.cid
             |),
             |reach(s, d) AS (
             |  SELECT s, d FROM adj
             |  UNION
             |  SELECT r.s, e.d FROM reach r JOIN adj e ON r.d = e.s
             |),
             |labels AS (SELECT s AS cid, least(s, min(d)) AS cl FROM reach GROUP BY s),
             |corelab AS (SELECT c.cx, c.cy, coalesce(l.cl, c.cid) AS cl
             |            FROM core c LEFT JOIN labels l ON c.cid = l.cid),
             |borderlab AS (
             |  SELECT nc.cx, nc.cy, min(cc.cl) AS cl
             |  FROM (SELECT cx, cy FROM cells WHERE n < 5) nc
             |  JOIN corelab cc ON abs(nc.cx - cc.cx) <= 1 AND abs(nc.cy - cc.cy) <= 1
             |  GROUP BY 1, 2
             |),
             |lab AS (SELECT cx, cy, cl, 'core' AS role FROM corelab
             |        UNION ALL SELECT cx, cy, cl, 'border' FROM borderlab)
             |SELECT p.vec_id, lab.cl AS cluster_id, coalesce(lab.role, 'noise') AS role
             |FROM pts p LEFT JOIN lab USING (cx, cy) ORDER BY p.vec_id""".stripMargin)),

    Q("q_pl_silhouette",
      (s, dir) => graft.pipeline.Clustering.silhouette(Tables.embeddings(s, dir))
        .orderBy("label"),
      Some(s"""WITH el AS (
              |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v,
              |         CAST(label AS BIGINT) AS lbl
              |  FROM embeddings),
              |cent AS (
              |  SELECT lbl, i, floor(avg(v[i]) * 1e6 + 0.5) / 1e6 AS mu
              |  FROM el CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
              |cl AS (SELECT lbl AS clbl, list(mu ORDER BY i) AS c
              |       FROM cent GROUP BY 1),
              |d AS (
              |  SELECT vec_id, lbl, clbl,
              |         sqrt(list_reduce([(v[i] - c[i]) * (v[i] - c[i])
              |                           for i in range(1, 65)],
              |                          (a, b) -> a + b)) AS dist
              |  FROM el CROSS JOIN cl),
              |ab AS (
              |  SELECT vec_id, max(lbl) AS label,
              |         max(CASE WHEN lbl = clbl THEN dist END) AS a,
              |         min(CASE WHEN lbl <> clbl THEN dist END) AS b
              |  FROM d GROUP BY 1)
              |SELECT label, count(*) AS n,
              |       floor(avg((b - a) / greatest(a, b)) * 1e4 + 0.5) / 1e4 AS mean_sil,
              |       floor(avg(a) * 1e4 + 0.5) / 1e4 AS mean_a,
              |       floor(avg(b) * 1e4 + 0.5) / 1e4 AS mean_b
              |FROM ab GROUP BY 1 ORDER BY label""".stripMargin)),

    // Top principal component by power iteration (5 rounds, deterministic
    // rounded iterates — the k-means/BPE replay stance): the oracle
    // rebuilds the rounded covariance and unrolls the same 5 matvec
    // + normalize rounds.
    Q("q_pl_pca",
      (s, dir) => graft.pipeline.Projection.pcaTop(
        Tables.embeddings(s, dir), "embedding", dim = 64).orderBy("i"),
      Some {
        // iterates are EXACT left-to-right list folds (no per-iterate
        // rounding — see Projection.pcaTop's determinism note)
        val matvec = "list_reduce([cvs[j] * xs[j] for j in range(1, 65)], (a, b) -> a + b)"
        val iterCtes = (1 to 5).map { t =>
          val prev = s"xl${t - 1}"
          s"""yl$t AS (SELECT list(y ORDER BY i) AS ys FROM (
             |  SELECT cvl.i, $matvec AS y FROM cvl, $prev)),
             |xl$t AS (SELECT [ys[i] / sqrt(list_reduce([y * y for y in ys],
             |    (a, b) -> a + b)) for i in range(1, 65)] AS xs FROM yl$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH $embCte,
           |ex AS (SELECT vec_id, i, v[i] AS x FROM e CROSS JOIN range(1, 65) t(i)),
           |mu AS (SELECT i, floor(avg(x) * 1e6 + 0.5) / 1e6 AS mu FROM ex GROUP BY 1),
           |cxy AS (SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS exy
           |        FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
           |cov AS (SELECT cxy.i, cxy.j,
           |               floor((exy - m1.mu * m2.mu) * 1e8 + 0.5) / 1e8 AS cv
           |        FROM cxy JOIN mu m1 ON m1.i = cxy.i JOIN mu m2 ON m2.i = cxy.j),
           |cvl AS (SELECT i, list(cv ORDER BY j) AS cvs FROM cov GROUP BY i),
           |xl0 AS (SELECT [1.0 / sqrt(64) for j in range(1, 65)] AS xs),
           |$iterCtes,
           |cxl AS (SELECT list(y ORDER BY i) AS cxs FROM (
           |  SELECT cvl.i, $matvec AS y FROM cvl, xl5)),
           |ev AS (SELECT floor(list_reduce([xs[i] * cxs[i] for i in range(1, 65)],
           |    (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS eigval FROM xl5, cxl),
           |sgn AS (SELECT CASE WHEN list_reduce(xs, (a, b) -> a + b) < 0
           |               THEN -1.0 ELSE 1.0 END AS s FROM xl5)
           |SELECT CAST(i AS BIGINT) AS i,
           |       floor(xs[i] * s * 1e6 + 0.5) / 1e6 AS loading, eigval
           |FROM range(1, 65) t(i), xl5, ev, sgn ORDER BY i""".stripMargin
      }),

    // Per-dimension embedding standardization (whitening without
    // rotation): μ/σ pre-rounded before application (the SAX determinism
    // stance) so the oracle's replay applies identical constants; gate
    // emits the first 4 standardized dims.
    Q("q_pl_whiten",
      (s, dir) => {
        val w = graft.pipeline.Projection.whiten(Tables.embeddings(s, dir), "embedding")
        w.select(col("vec_id") +: (1 to 4).map(i =>
            (floor(element_at(col("embedding"), i) * 1e4 + 0.5) / 1e4).as(s"z$i")): _*)
          .orderBy("vec_id")
      },
      Some(s"""WITH $embCte,
              |st AS (
              |  SELECT i,
              |         floor(avg(v[i]) * 1e6 + 0.5) / 1e6 AS mu,
              |         floor(stddev_pop(v[i]) * 1e6 + 0.5) / 1e6 AS sd
              |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1)
              |SELECT e.vec_id,
              |       floor((CASE WHEN m1.sd > 0 THEN (v[1] - m1.mu) / m1.sd ELSE 0 END) * 1e4 + 0.5) / 1e4 AS z1,
              |       floor((CASE WHEN m2.sd > 0 THEN (v[2] - m2.mu) / m2.sd ELSE 0 END) * 1e4 + 0.5) / 1e4 AS z2,
              |       floor((CASE WHEN m3.sd > 0 THEN (v[3] - m3.mu) / m3.sd ELSE 0 END) * 1e4 + 0.5) / 1e4 AS z3,
              |       floor((CASE WHEN m4.sd > 0 THEN (v[4] - m4.mu) / m4.sd ELSE 0 END) * 1e4 + 0.5) / 1e4 AS z4
              |FROM e JOIN st m1 ON m1.i = 1 JOIN st m2 ON m2.i = 2
              |       JOIN st m3 ON m3.i = 3 JOIN st m4 ON m4.i = 4
              |ORDER BY vec_id""".stripMargin)),

    // Flesch reading-ease from regex counts (vowel-run syllable
    // approximation) — corpus-quality binning, pure projection.
    Q("q_pl_readability",
      (s, dir) => TextAnalysis.readability(Tables.documents(s, dir))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_words,
             |  greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
             |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
             |  CASE WHEN len(string_split_regex(lower(text), '\s+')) = 0 THEN NULL
             |       ELSE floor((206.835
             |         - 1.015 * (len(string_split_regex(lower(text), '\s+'))
             |                    / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
             |         - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |                   / len(string_split_regex(lower(text), '\s+')))) * 1e4 + 0.5) / 1e4
             |  END AS flesch
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Zipf rank-frequency fit per language: regression over the top-100
    // vocab terms — slope ≈ −1 is natural text; the corpus-quality screen.
    Q("q_pl_zipf",
      (s, dir) => TextAnalysis.zipfFit(Tables.documents(s, dir))
        .orderBy("lang"),
      Some("""WITH tf AS (
             |  SELECT lang, word, count(*) AS n
             |  FROM (SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS word
             |        FROM documents)
             |  WHERE word <> '' GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY lang
             |                               ORDER BY n DESC, word) AS rank
             |  FROM tf)
             |SELECT lang,
             |       floor(regr_slope(ln(n), ln(rank)) * 1e4 + 0.5) / 1e4 AS slope,
             |       floor(regr_intercept(ln(n), ln(rank)) * 1e4 + 0.5) / 1e4 AS intercept,
             |       floor(regr_r2(ln(n), ln(rank)) * 1e4 + 0.5) / 1e4 AS r2,
             |       count(*) AS n_terms
             |FROM ranked WHERE rank <= 100
             |GROUP BY 1 ORDER BY lang""".stripMargin)),

    // ---- distribution drift: two-sample KS per language vs 'en' ---------
    //
    // KS statistic of the n_chars distribution for every non-en language
    // against the en baseline — the new-source acceptance check. One
    // (group, value) count pass; ECDFs run over the DISTINCT-value frame
    // (here: |distinct lengths|), so at 100 TB continuous values must be
    // pre-binned first (the q_ts_psi shape) to bound that frame.
    Q("q_pl_ks_drift",
      (s, dir) =>
        graft.pipeline.Drift.ksTest(
          Tables.documents(s, dir), "lang", "n_chars", baseline = "en")
          .orderBy("grp"),
      Some("""WITH base AS (
             |  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v FROM documents),
             |pd AS (SELECT DISTINCT g AS pair FROM base WHERE g <> 'en'),
             |tagged AS (
             |  SELECT g AS pair, 0 AS is_base, v FROM base WHERE g <> 'en'
             |  UNION ALL
             |  SELECT pair, 1, v FROM base CROSS JOIN pd WHERE g = 'en'),
             |pv AS (
             |  SELECT pair, v,
             |         sum(CASE WHEN is_base = 1 THEN 1 ELSE 0 END) AS nb,
             |         sum(CASE WHEN is_base = 0 THEN 1 ELSE 0 END) AS nx
             |  FROM tagged GROUP BY 1, 2),
             |cum AS (
             |  SELECT pair, v, sum(nb) OVER w AS cb, sum(nx) OVER w AS cx
             |  FROM pv
             |  WINDOW w AS (PARTITION BY pair ORDER BY v ROWS UNBOUNDED PRECEDING)),
             |tot AS (SELECT pair, sum(nb) AS tb, sum(nx) AS tx FROM pv GROUP BY 1)
             |SELECT cum.pair AS grp,
             |       CAST(max(tb) AS BIGINT) AS n_base,
             |       CAST(max(tx) AS BIGINT) AS n_grp,
             |       floor(max(abs(cb * 1.0 / tb - cx * 1.0 / tx)) * 1e4 + 0.5) / 1e4 AS ks
             |FROM cum JOIN tot ON cum.pair = tot.pair
             |GROUP BY 1 ORDER BY grp""".stripMargin)),

    // ---- distribution drift: Wasserstein-1 per language vs 'en' ---------
    //
    // Earth mover's distance on a shared 20-cell fixed-width grid — sees
    // HOW FAR the n_chars mass moved (KS only sees the largest ECDF gap).
    // The bin sum is exact integer arithmetic |cb*tx - cx*tb|; the only
    // float ops are the final multiply/divide, identical in any engine.
    Q("q_dq_wasserstein",
      (s, dir) =>
        graft.pipeline.Drift.wasserstein1(
          Tables.documents(s, dir), "lang", "n_chars", baseline = "en", bins = 20)
          .orderBy("grp"),
      Some(s"""WITH $drBinsCte,
             |cum AS (
             |  SELECT pair, bin, sum(nb) OVER w AS cb, sum(nx) OVER w AS cx
             |  FROM dense
             |  WINDOW w AS (PARTITION BY pair ORDER BY bin ROWS UNBOUNDED PRECEDING))
             |SELECT cum.pair AS grp,
             |       CAST(max(tb) AS BIGINT) AS n_base,
             |       CAST(max(tx) AS BIGINT) AS n_grp,
             |       floor(CAST(sum(abs(cb * tx - cx * tb)) AS DOUBLE) * max((hi - lo) / 20)
             |             / (max(tb) * max(tx)) * 1e6 + 0.5) / 1e6 AS w1
             |FROM cum JOIN tot ON cum.pair = tot.pair CROSS JOIN bounds
             |GROUP BY 1 ORDER BY grp""".stripMargin)),

    // ---- distribution drift: Jensen-Shannon divergence vs 'en' ----------
    //
    // Symmetric, finite on disjoint supports (no epsilon smoothing, unlike
    // PSI), bounded [0,1] in base 2 — the drift score a dashboard can
    // threshold uniformly across columns. Same shared-grid count pass as
    // q_dq_wasserstein; q_ts_psi's <=bins-log-terms + 1e-4 rounding
    // determinism precedent.
    Q("q_dq_jsd",
      (s, dir) =>
        graft.pipeline.Drift.jsDivergence(
          Tables.documents(s, dir), "lang", "n_chars", baseline = "en", bins = 20)
          .orderBy("grp"),
      Some(s"""WITH $drBinsCte
             |SELECT dense.pair AS grp,
             |       CAST(max(tb) AS BIGINT) AS n_base,
             |       CAST(max(tx) AS BIGINT) AS n_grp,
             |       floor(sum(
             |         CASE WHEN nb > 0 THEN (nb * 1.0 / tb) * ln((nb * 1.0 / tb) /
             |           ((nb * 1.0 / tb + nx * 1.0 / tx) / 2.0)) ELSE 0.0 END * 0.5 +
             |         CASE WHEN nx > 0 THEN (nx * 1.0 / tx) * ln((nx * 1.0 / tx) /
             |           ((nb * 1.0 / tb + nx * 1.0 / tx) / 2.0)) ELSE 0.0 END * 0.5)
             |         / 0.6931471805599453 * 1e4 + 0.5) / 1e4 AS jsd
             |FROM dense JOIN tot ON dense.pair = tot.pair
             |GROUP BY 1 ORDER BY grp""".stripMargin)),

    // Robust outlier screen (r12, Iglewicz–Hoaglin modified z-score):
    // per-language median/MAD of document length, |z| > 3.5 flagged —
    // the heavy-tail-proof length screen (mean/σ breaks on exactly the
    // glitch batches this exists for). Integer inputs → exact medians
    // (.0/.5) → the z comparison is the same float expression from the
    // same exact operands in both engines.
    Q("q_dq_mad",
      (s, dir) =>
        graft.pipeline.Checks.madOutliers(
          Tables.documents(s, dir), "n_chars", "lang").orderBy("g"),
      Some("""WITH med AS (
             |  SELECT lang AS g, quantile_cont(n_chars, 0.5) AS med
             |  FROM documents GROUP BY 1),
             |st AS (
             |  SELECT d.lang AS g, max(m.med) AS med,
             |         quantile_cont(abs(d.n_chars - m.med), 0.5) AS mad
             |  FROM documents d JOIN med m ON d.lang = m.g GROUP BY 1)
             |SELECT d.lang AS g, count(*) AS n,
             |       CAST(sum(CASE WHEN (st.mad > 0 AND
             |             abs(0.6745 * (d.n_chars - st.med) / st.mad) > 3.5)
             |           OR (st.mad = 0 AND d.n_chars != st.med)
             |         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |       max(st.med) AS med, max(st.mad) AS mad
             |FROM documents d JOIN st ON d.lang = st.g
             |GROUP BY 1 ORDER BY g""".stripMargin),
      benchExtra = true),

    // Categorical mutual information (r12): MI(lang; source) in bits —
    // the stratification-relevance number. Exact-integer cell counts;
    // per-cell contributions pre-rounded 1e-9 (cross-engine log2 ulps);
    // the total is an ORDERED left fold over (a, b)-sorted cells on
    // BOTH engines (aggregate/sort_array ≡ list_reduce/list ORDER BY).
    Q("q_dq_mutual_info",
      (s, dir) =>
        graft.pipeline.Checks.mutualInformation(
          Tables.documents(s, dir), "lang", "source", "lang_x_source"),
      Some("""WITH cells AS (
             |  SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b,
             |         count(*) AS nab
             |  FROM documents GROUP BY 1, 2),
             |na AS (SELECT a, sum(nab) AS na FROM cells GROUP BY 1),
             |nb AS (SELECT b, sum(nab) AS nb FROM cells GROUP BY 1),
             |tot AS (SELECT sum(nab) AS n FROM cells),
             |c AS (
             |  SELECT a, b,
             |         floor((nab * 1.0 / n) *
             |           log2((nab * 1.0 * n) / (1.0 * na * nb)) * 1e9 + 0.5) / 1e9 AS c
             |  FROM cells JOIN na USING (a) JOIN nb USING (b) CROSS JOIN tot)
             |SELECT 'lang_x_source' AS target,
             |       CAST((SELECT n FROM tot) AS BIGINT) AS n_rows,
             |       (SELECT count(*) FROM c) AS n_cells,
             |       floor(list_reduce(list(c.c ORDER BY a, b), (x, y) -> x + y)
             |         * 1e6 + 0.5) / 1e6 AS mi_bits
             |FROM c""".stripMargin),
      benchExtra = true),
  ) ++ rawTail

  private val decontamOracle =
    s"""WITH $wordsCte, $shinglesCte,
              |bench AS (SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id % 20 = 0),
              |corpus AS (SELECT doc_id, hs FROM sh WHERE doc_id % 20 != 0),
              |hits AS (
              |  SELECT c.doc_id, count(*) AS n_overlap
              |  FROM (SELECT doc_id, unnest(hs) AS h FROM corpus) c
              |  JOIN bench USING (h) GROUP BY c.doc_id
              |), ann AS (
              |  SELECT corpus.doc_id, len(hs) AS n_shingles, coalesce(n_overlap, 0) AS n_overlap,
              |         CASE WHEN len(hs) = 0 THEN 0.0
              |              ELSE floor(coalesce(n_overlap, 0) * 1.0 / len(hs) * 1e4 + 0.5) / 1e4 END AS contam_frac
              |  FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
              |)
              |SELECT doc_id, n_shingles, n_overlap, contam_frac, contam_frac >= 0.5 AS contaminated
              |FROM ann ORDER BY doc_id""".stripMargin

  /** Transitive-closure near-dup components → CTE `cl`(doc_id,
    * cluster_id) with singletons included — shared by the cluster gates
    * and the leakage-safe split.
    */
  private val dupClusterCtes =
    s"""$wordsCte, $shinglesCte, $verifiedPairsCte,
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM vp
       |          UNION SELECT doc_b, doc_a FROM vp),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
       |),
       |labels AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s),
       |cl AS (SELECT dd.doc_id, coalesce(l.cluster_id, dd.doc_id) AS cluster_id
       |       FROM documents dd LEFT JOIN labels l ON dd.doc_id = l.doc_id)""".stripMargin

  private val dupClustersOracle =
    s"""WITH RECURSIVE $dupClusterCtes
       |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
       |FROM cl ORDER BY doc_id""".stripMargin

  private def rawTail: Seq[Q] = Seq(

    // Near-dup clusters: connected components over the verified LSH pair
    // set (min-label propagation in Spark; transitive closure via a
    // recursive CTE in the oracle), canonical = min doc_id per component.
    Q("q_pl_dup_clusters",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.dupClusters(docs, Dedup.minhashLshPairs(docs, 0.8)).orderBy("doc_id")
      },
      Some(dupClustersOracle)),

    // Same components via large-star/small-star contraction — the
    // O(log n)-round corpus-scale CC (label propagation is O(diameter));
    // output identical, so the same transitive-closure oracle applies.
    Q("q_pl_dup_clusters_star",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.dupClustersStar(docs, Dedup.minhashLshPairs(docs, 0.8)).orderBy("doc_id")
      },
      Some(dupClustersOracle)),

    // Concat-and-chunk sequence packing: global token offsets via the
    // scale-safe two-pass prefix sum (range partition → local window →
    // per-partition bases), 512-token context windows. Offsets are a pure
    // function of the data, so the single-window oracle matches exactly.
    Q("q_pl_pack",
      (s, dir) => graft.pipeline.Packing.chunkAssignments(Tables.documents(s, dir), 512)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
             |  FROM documents
             |), o AS (
             |  SELECT doc_id, n_tokens,
             |         CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset
             |  FROM t
             |)
             |SELECT doc_id, n_tokens, start_offset,
             |       CAST(floor(start_offset / 512) AS BIGINT) AS first_chunk,
             |       CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 512) AS BIGINT) AS last_chunk
             |FROM o ORDER BY doc_id""".stripMargin)),

    // Per-stratum cap (per-domain/language document cap): keep the 50
    // smallest salted hashes per predicted language — deterministic, and
    // skew-proof via the two-phase local→global rank.
    Q("q_pl_cap",
      (s, dir) => {
        val lang = TextAnalysis.langId(Tables.documents(s, dir))
          .select(col("doc_id"), col("pred_lang"))
        Sampling.capPerStratum(lang, "doc_id", "pred_lang", 50, "cap3")
          .orderBy("doc_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('cap3:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH $wordsCte, $langScoredCte,
           |lang AS (SELECT doc_id, $langCaseSql AS pred_lang FROM scored),
           |r AS (
           |  SELECT doc_id, pred_lang,
           |         row_number() OVER (PARTITION BY pred_lang ORDER BY $h, doc_id) AS rn
           |  FROM lang
           |)
           |SELECT doc_id, pred_lang FROM r WHERE rn <= 50 ORDER BY doc_id""".stripMargin
      }),

    // Neyman-allocation stratified sample (r10): the 200-doc budget
    // splits across languages ∝ N_h·σ_h of n_chars — computed entirely
    // in integer arithmetic (Σx/Σx² exact, one IEEE sqrt, quantized
    // weights, integer division), so the oracle replays the allocation
    // AND the salted-hash draw bit for bit.
    Q("q_pl_neyman",
      (s, dir) => Sampling.neymanSample(
          Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id", "lang", "n_chars", 200, "ney7")
        .orderBy("doc_id"),
      Some {
        val h = "CAST(concat('0x', substr(md5('ney7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH st AS (
           |  SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS s1,
           |         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
           |  FROM documents GROUP BY 1
           |), w AS (
           |  SELECT lang, n,
           |         CAST(floor(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS wh
           |  FROM st
           |), tot AS (SELECT CAST(sum(wh) AS BIGINT) AS tw FROM w),
           |caps AS (
           |  SELECT lang, least(n, (200 * wh) // tw) AS k FROM w CROSS JOIN tot
           |), r AS (
           |  SELECT doc_id, lang, n_chars,
           |         row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rn
           |  FROM documents
           |)
           |SELECT doc_id, lang, n_chars FROM r JOIN caps USING (lang)
           |WHERE rn <= k ORDER BY doc_id""".stripMargin
      }),

    // Domain-mixture rebalance: downsample each source to a 1:2:3 target
    // mix (sources bucketed by index % 3) — T = min_s n_s/w_s, per-source
    // caps, smallest-salted-hash keeps. Fully replayed by the oracle.
    Q("q_pl_mixture",
      (s, dir) => {
        val weights = (0 until 20).map(i => s"src$i" -> (i % 3 + 1).toDouble).toMap
        Sampling.rebalanceMixture(
            Tables.documents(s, dir).select(col("doc_id"), col("source")),
            "doc_id", "source", weights, "mix5")
          .orderBy("doc_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('mix5:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        val values = (0 until 20).map(i => s"('src$i', ${(i % 3 + 1).toDouble})").mkString(", ")
        s"""WITH w(source, wt) AS (VALUES $values),
           |n AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
           |j AS (SELECT n.source, n.n, w.wt FROM n JOIN w USING (source)),
           |t AS (SELECT min(n / wt) AS t FROM j),
           |caps AS (SELECT source, least(n, CAST(floor(wt * t.t + 1e-9) AS BIGINT)) AS k
           |         FROM j CROSS JOIN t),
           |r AS (SELECT d.doc_id, d.source,
           |             row_number() OVER (PARTITION BY d.source ORDER BY $h, d.doc_id) AS rn
           |      FROM documents d JOIN caps USING (source))
           |SELECT doc_id, source FROM r JOIN caps USING (source)
           |WHERE rn <= k ORDER BY doc_id""".stripMargin
      }),

    // Temperature sampling at α=0.5: every language downsampled to the
    // geometric mean of its size and the smallest language's — the
    // multilingual flattening step (the `lang` column is genuinely
    // skewed: en dominates). Caps are a single sqrt of an exact integer
    // product, so the oracle replays them bit-identically.
    Q("q_pl_temperature",
      (s, dir) => Sampling.temperatureSample(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "doc_id", "lang", alpha = 0.5, salt = "temp7")
        .orderBy("doc_id"),
      Some {
        val h = "CAST(concat('0x', substr(md5('temp7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
           |m AS (SELECT min(n) AS nmin FROM n),
           |caps AS (SELECT lang, least(n, CAST(floor(sqrt(m.nmin * n.n) + 0.5) AS BIGINT)) AS k
           |         FROM n CROSS JOIN m),
           |r AS (SELECT d.doc_id, d.lang,
           |             row_number() OVER (PARTITION BY d.lang ORDER BY $h, d.doc_id) AS rn
           |      FROM documents d)
           |SELECT r.doc_id, r.lang FROM r JOIN caps USING (lang)
           |WHERE r.rn <= caps.k ORDER BY r.doc_id""".stripMargin
      }),

    // Deterministic 80/10/10 split assignment: integer hash-band compare,
    // stable under corpus growth (a key's label depends only on salt+key).
    Q("q_pl_split",
      (s, dir) => Sampling.splitAssign(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "split1")
        .orderBy("doc_id"),
      Some {
        val h = "CAST(concat('0x', substr(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""SELECT doc_id, source,
           |       CASE WHEN $h < 800000 THEN 'train'
           |            WHEN $h < 900000 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // End-to-end CURATION CHAIN: exact dedup → span-dup-fraction filter →
    // domain-mixture rebalance, composed as one pipeline and replayed as
    // one oracle chain (mixture counts/caps computed on the FILTERED
    // survivors). Weights restrict to surviving sources so a stage that
    // empties a stratum shrinks the mix instead of failing the build.
    Q("q_pl_curation_chain",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
        val uniq = docs.join(keep, "doc_id")
        val ok = Dedup.spanDupStats(uniq).filter(col("dup_span_frac") <= 0.5)
          .select("doc_id")
        // the (doc_id, source) survivor frame feeds the mixture's count
        // pass AND the final output; localCheckpoint materializes it once
        // and — unlike the r5 cache(), which leaked storage across
        // repeated gate/bench invocations — its blocks are reclaimed by
        // the ContextCleaner once the frame is unreachable. Checkpointing
        // the text-bearing uniq frame instead was measured SLOWER warm
        // (2.4 s vs 1.1 s at sf0.1) and no better cold: the chain's cold
        // cost is operator codegen, not recompute, so only the slim
        // survivor frame is worth materializing. Tradeoff: localCheckpoint
        // blocks are NON-reliable executor storage — on a cluster, losing
        // an executor mid-query fails the job instead of recomputing. Right
        // for this single-process gate; a 100 TB deployment should use
        // reliable checkpoint() (or persist with replication) here.
        val surv = uniq.join(ok, "doc_id").select(col("doc_id"), col("source"))
          .localCheckpoint()
        val weights = (0 until 20).map(i => s"src$i" -> (i % 3 + 1).toDouble).toMap
        Sampling.rebalanceMixture(surv, "doc_id", "source", weights, "chain5",
            dropMissing = true)
          .orderBy("doc_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('chain5:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        val values = (0 until 20).map(i => s"('src$i', ${(i % 3 + 1).toDouble})").mkString(", ")
        s"""WITH ud AS (
           |  SELECT d.* FROM documents d
           |  JOIN (SELECT min(doc_id) AS doc_id FROM documents
           |        GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))) k
           |  USING (doc_id)
           |), uw AS (
           |  SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS w FROM ud
           |), sp AS (
           |  SELECT doc_id,
           |         CAST(concat('0x', substr(md5(list_aggregate(w[i:i+7], 'string_agg', ' ')), 1, 15)) AS BIGINT) AS dg
           |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
           |        FROM uw WHERE len(w) >= 8)
           |), dd AS (
           |  SELECT dg, count(DISTINCT doc_id) AS nd FROM sp GROUP BY 1
           |), st AS (
           |  SELECT sp.doc_id, count(*) AS n_spans,
           |         CAST(sum(CASE WHEN dd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
           |  FROM sp JOIN dd USING (dg) GROUP BY sp.doc_id
           |), sv AS (
           |  SELECT uw.doc_id, uw.source FROM uw LEFT JOIN st USING (doc_id)
           |  WHERE floor((CASE WHEN coalesce(n_spans, 0) = 0 THEN 0.0
           |               ELSE n_dup * 1.0 / n_spans END) * 1e4 + 0.5) / 1e4 <= 0.5
           |), wt(source, wt) AS (VALUES $values),
           |n AS (SELECT source, count(*) AS n FROM sv GROUP BY 1),
           |j AS (SELECT n.source, n.n, wt.wt FROM n JOIN wt USING (source)),
           |t AS (SELECT min(n / wt) AS t FROM j),
           |caps AS (SELECT source, least(n, CAST(floor(wt * t.t + 1e-9) AS BIGINT)) AS k
           |         FROM j CROSS JOIN t),
           |r AS (SELECT sv.doc_id, sv.source,
           |             row_number() OVER (PARTITION BY sv.source ORDER BY $h, sv.doc_id) AS rn
           |      FROM sv JOIN caps USING (source))
           |SELECT doc_id, source FROM r JOIN caps USING (source)
           |WHERE rn <= k ORDER BY doc_id""".stripMargin
      }),

    // Scalar int8 embedding quantization + L2 reconstruction error:
    // 4× smaller vectors for ANN storage; floor-rounding and explicit
    // squaring keep the arithmetic bit-identical across engines.
    // Gate projection stringifies `codes` (the compare driver can only
    // hash scalar columns); Similarity.quantize itself keeps the typed ARRAY.
    Q("q_pl_quant",
      (s, dir) => Similarity.quantize(Tables.embeddings(s, dir))
        .withColumn("codes", array_join(col("codes"), ","))
        .orderBy("vec_id"),
      Some(s"""WITH $embCte, q AS (
              |  SELECT vec_id, v, list_min(v) AS mn,
              |         CASE WHEN list_max(v) = list_min(v) THEN 1.0
              |              ELSE (list_max(v) - list_min(v)) / 255.0 END AS sc
              |  FROM e
              |), c AS (
              |  SELECT vec_id, v, mn, sc,
              |         [CAST(floor((x - mn) / sc + 0.5) AS INTEGER) for x in v] AS codes
              |  FROM q
              |)
              |SELECT vec_id,
              |       floor(mn * 1e6 + 0.5) / 1e6 AS qmin,
              |       floor(sc * 1e6 + 0.5) / 1e6 AS qscale,
              |       array_to_string(codes, ',') AS codes,
              |       floor(sqrt(list_reduce(
              |         [(v[i] - (mn + codes[i] * sc)) * (v[i] - (mn + codes[i] * sc))
              |          for i in range(1, len(v) + 1)], (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS recon_err
              |FROM c ORDER BY vec_id""".stripMargin)),

    // Token-window text chunking (RAG/training splitter): 64-word chunks,
    // one row per chunk, whitespace-normalized text.
    Q("q_pl_chunk_text",
      (s, dir) => TextAnalysis.chunkText(Tables.documents(s, dir), 64)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH words AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
             |), c AS (
             |  SELECT doc_id, w, CAST(ceil(len(w) / 64.0) AS BIGINT) AS nc FROM words
             |), x AS (
             |  SELECT doc_id, unnest(range(0, nc)) AS chunk_idx, w FROM c
             |)
             |SELECT doc_id, chunk_idx,
             |       array_to_string(w[chunk_idx * 64 + 1 : chunk_idx * 64 + 64], ' ') AS chunk_text
             |FROM x ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Corpus profile: per-column row/null/exact-distinct counts over the
    // events table (the widest gate table), one aggregation pass.
    Q("q_pl_profile",
      (s, dir) => TextAnalysis.profile(
          Tables.events(s, dir), Seq("event_type", "user_id", "props"))
        .orderBy("column"),
      Some("""SELECT 'event_type' AS "column", count(*) AS n_rows,
             |       count(*) - count(event_type) AS n_null, count(DISTINCT event_type) AS n_distinct
             |FROM events
             |UNION ALL
             |SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id) FROM events
             |UNION ALL
             |SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props) FROM events
             |ORDER BY "column"""".stripMargin)),

    // Gap-based sessionization of the event log (30-min gap): per-user
    // session bounds, event count, value sum. Partitioned windows only —
    // one shuffle on user_id.
    Q("q_pl_sessions",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"),
          (col("ts") / lit(1000000000L)).cast("long").as("t"),
          col("value"))
        graft.pipeline.Sessionize.sessions(ev, "user_id", "t", "value", 1800L)
          .withColumn("total_value", floor(col("total_value") * 1e4 + 0.5) / 1e4)
          .orderBy("user_id", "session_idx")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) // 1000000000 AS t, value FROM events
             |), b AS (
             |  SELECT user_id, t, value,
             |         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, value) >= 1800
             |              THEN 1 ELSE 0 END AS brk
             |  FROM e
             |), s AS (
             |  SELECT user_id, t, value,
             |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t, value
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
             |  FROM b
             |)
             |SELECT user_id, session_idx, min(t) AS session_start, max(t) AS session_end,
             |       count(*) AS n_events,
             |       floor(sum(value) * 1e4 + 0.5) / 1e4 AS total_value
             |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin)),

    // Binary-quantization ANN: packed sign-bit signatures (two BIGINT
    // halves), Hamming candidate scan (XOR + popcount), exact cosine
    // rerank of the top k·candMult — the 1-bit-quantization + rescoring
    // serving pattern. The ALGORITHM is the contract; the oracle replays
    // both stages (same integer Hamming ranking, same rerank tail).
    Q("q_ann_hamming",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.hammingTopK(emb, emb.filter(col("vec_id") < 10), 5,
            candMult = 4)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $embCte,
              |sig AS (
              |  SELECT vec_id, v,
              |         list_reduce([CASE WHEN v[d + 1] > 0
              |             THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END
              |           for d in range(0, 32)], (a, b) -> a + b) AS sig_lo,
              |         list_reduce([CASE WHEN v[d + 1] > 0
              |             THEN (CAST(1 AS BIGINT) << (d - 32)) ELSE CAST(0 AS BIGINT) END
              |           for d in range(32, 64)], (a, b) -> a + b) AS sig_hi
              |  FROM e
              |),
              |q AS (SELECT vec_id AS q_id, v AS qv, sig_lo AS q_lo, sig_hi AS q_hi
              |      FROM sig WHERE vec_id < 10),
              |cand AS (
              |  SELECT q_id, qv, vec_id, v,
              |         row_number() OVER (PARTITION BY q_id
              |           ORDER BY bit_count(xor(sig_lo, q_lo)) + bit_count(xor(sig_hi, q_hi)),
              |                    vec_id) AS crank
              |  FROM sig CROSS JOIN q WHERE vec_id != q_id
              |),
              |scored AS (
              |  SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos,
              |         row_number() OVER (PARTITION BY q_id
              |           ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
              |  FROM cand WHERE crank <= 20
              |)
              |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
              |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Hard-negative mining (contrastive training data): per query, the
    // top-k most-similar vectors with a DIFFERENT label. The label
    // predicate rides the corpus scan — brute-force oracle with the same
    // filter.
    Q("q_pl_hard_negatives",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH el AS (
              |  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v
              |  FROM embeddings
              |),
              |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
              |      FROM el WHERE vec_id < 10),
              |scored AS (
              |  SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos,
              |         row_number() OVER (PARTITION BY q_id
              |           ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
              |  FROM el CROSS JOIN q WHERE vec_id != q_id AND label != q_label
              |)
              |SELECT q_id, vec_id, rank, floor((cos) * 1e6 + 0.5) / 1e6 AS cos
              |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // SemDeDup: k-means cluster the embeddings, drop the higher vec_id of
    // every within-cluster pair with cosine >= tau. The oracle replays
    // the deterministic Lloyd's fit (shared kmeans CTE chain) and the
    // keeper rule.
    Q("q_pl_semdedup",
      (s, dir) => graft.pipeline.Dedup.semDedup(
          Tables.embeddings(s, dir), k = 8, iters = 2, tau = 0.45)
        .orderBy("vec_id"),
      Some(s"""WITH ${kmeansCtes(8, 2, 64)},
              |cl AS (
              |  SELECT vec_id, v,
              |         CAST(list_indexof(ds, list_min(ds)) - 1 AS BIGINT) AS cluster
              |  FROM asg
              |),
              |dropped AS (
              |  SELECT DISTINCT b.vec_id
              |  FROM cl a JOIN cl b
              |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              |  WHERE ${cosSql("a.v", "b.v")} >= 0.45
              |)
              |SELECT cl.vec_id, cl.cluster,
              |       cl.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
              |FROM cl ORDER BY vec_id""".stripMargin)),

    // Interpolated bigram-LM surprisal (KenLM-shaped corpus-self LM):
    // integer count tables, one float log per bigram position, 1e-4
    // rounded per-doc mean.
    Q("q_pl_lm_bigram",
      (s, dir) => TextAnalysis.bigramSurprisal(Tables.documents(s, dir))
        .orderBy("doc_id"),
      Some(s"""WITH $wordsCte,
              |wfl AS (SELECT doc_id, [x for x in w if length(x) > 0] AS wf FROM words),
              |bg AS (
              |  SELECT doc_id,
              |         unnest([{'w1': wf[i], 'w2': wf[i + 1]}
              |                 for i in range(1, len(wf))], recursive := true)
              |  FROM wfl
              |),
              |tok AS (SELECT doc_id, unnest(wf) AS word FROM wfl),
              |bgc AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
              |w1c AS (SELECT w1, count(*) AS cw1 FROM bg GROUP BY 1),
              |uc AS (SELECT word, count(*) AS cu FROM tok GROUP BY 1),
              |tot AS (SELECT count(*) AS t FROM tok),
              |sc AS (
              |  SELECT bg.doc_id, count(*) AS n_bigrams,
              |         floor(avg(-log2(
              |             0.7 * CAST(cbg AS DOUBLE) / CAST(cw1 AS DOUBLE)
              |             + 0.3 * CAST(cu AS DOUBLE) / CAST(t AS DOUBLE))) * 1e4 + 0.5) / 1e4
              |           AS bigram_surprisal
              |  FROM bg
              |  JOIN bgc USING (w1, w2)
              |  JOIN w1c USING (w1)
              |  JOIN uc ON uc.word = bg.w2
              |  CROSS JOIN tot
              |  GROUP BY 1
              |)
              |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.bigram_surprisal
              |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // Hybrid retrieval: Reciprocal Rank Fusion of the BM25 top-50 (text
    // query) and the brute-force cosine top-50 of query vector 0 (dense
    // query), over doc_id = vec_id. Fused score is a rational of integer
    // ranks — engine-exact; ties break by doc_id.
    Q("q_pl_rrf",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val sparse = TextAnalysis.bm25TopK(docs, Seq("spark", "hash", "merge"),
          docs.count(), 50)
        val dense = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 50)
        graft.pipeline.Hybrid.rrf(sparse, dense, kConst = 60, topK = 20)
          .orderBy("rrf_rank")
      },
      Some(s"""WITH $wordsCte,
              |wl AS (SELECT doc_id, CAST(len([x for x in w if length(x) > 0]) AS DOUBLE) AS dl FROM words),
              |st AS (SELECT floor(avg(dl) * 1e6 + 0.5) / 1e6 AS avgdl,
              |              (SELECT count(*) FROM documents) AS nd FROM wl),
              |tokq AS (SELECT doc_id, unnest(w) AS term FROM words),
              |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tokq
              |       WHERE term IN ('spark', 'hash', 'merge') GROUP BY 1, 2),
              |dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
              |bsc AS (
              |  SELECT tf.doc_id,
              |         sum(ln(1.0 + (st.nd - dfx.df + 0.5) / (dfx.df + 0.5))
              |             * tf.tf * 2.2
              |             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * wl.dl / st.avgdl))) AS s
              |  FROM tf JOIN dfx USING (term) JOIN wl USING (doc_id) CROSS JOIN st
              |  GROUP BY 1
              |),
              |sparse AS (
              |  SELECT doc_id,
              |         row_number() OVER (ORDER BY floor(s * 1e4 + 0.5) / 1e4 DESC, doc_id) AS r_sparse
              |  FROM bsc QUALIFY r_sparse <= 50
              |),
              |$embCte,
              |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
              |dense AS (
              |  SELECT vec_id AS doc_id,
              |         row_number() OVER (ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS r_dense
              |  FROM e CROSS JOIN qv WHERE vec_id != 0
              |  QUALIFY r_dense <= 50
              |),
              |fused AS (
              |  SELECT coalesce(sparse.doc_id, dense.doc_id) AS doc_id,
              |         r_sparse, r_dense,
              |         coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + r_sparse AS DOUBLE), 0.0)
              |           + coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + r_dense AS DOUBLE), 0.0) AS rrf_raw
              |  FROM sparse FULL OUTER JOIN dense ON sparse.doc_id = dense.doc_id
              |)
              |SELECT doc_id,
              |       row_number() OVER (ORDER BY rrf_raw DESC, doc_id) AS rrf_rank,
              |       floor(rrf_raw * 1e6 + 0.5) / 1e6 AS rrf, r_sparse, r_dense
              |FROM fused QUALIFY rrf_rank <= 20 ORDER BY rrf_rank""".stripMargin)),

    // Document-level PMI collocations over the df-pruned top vocabulary.
    Q("q_pl_pmi",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.pmiPairs(docs, docs.count(), topV = 40, minPair = 5)
          .orderBy("w1", "w2")
      },
      Some(s"""WITH $wordsCte,
              |dw AS (SELECT DISTINCT doc_id, x AS word
              |       FROM (SELECT doc_id, unnest(w) AS x FROM words)
              |       WHERE length(x) > 0),
              |v AS (SELECT word, count(*) AS df FROM dw GROUP BY 1
              |      ORDER BY df DESC, word LIMIT 40),
              |k AS (SELECT dw.doc_id, dw.word, v.df FROM dw JOIN v USING (word)),
              |p AS (
              |  SELECT a.word AS w1, b.word AS w2, a.df AS df1, b.df AS df2,
              |         count(*) AS n_ab
              |  FROM k a JOIN k b ON a.doc_id = b.doc_id AND a.word < b.word
              |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5
              |)
              |SELECT w1, w2, n_ab, df1, df2,
              |       floor(ln(n_ab * CAST((SELECT count(*) FROM documents) AS DOUBLE)
              |                / CAST(df1 * df2 AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS pmi
              |FROM p ORDER BY w1, w2""".stripMargin)),

    // Reciprocal top-1 neighbors: both endpoints must pick each other.
    Q("q_ann_mutual_nn",
      (s, dir) => Similarity.mutualNn(Tables.embeddings(s, dir))
        .orderBy("vec_a", "vec_b"),
      Some(s"""WITH $embCte,
              |nn AS (
              |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |         ${cosSql("a.v", "b.v")} AS cos,
              |         row_number() OVER (PARTITION BY a.vec_id
              |             ORDER BY ${cosSql("a.v", "b.v")} DESC, b.vec_id) AS rn
              |  FROM e a JOIN e b ON a.vec_id != b.vec_id
              |  QUALIFY rn = 1
              |)
              |SELECT x.a_id AS vec_a, x.b_id AS vec_b,
              |       floor((x.cos) * 1e6 + 0.5) / 1e6 AS cos
              |FROM nn x JOIN nn y ON x.a_id = y.b_id AND x.b_id = y.a_id
              |                   AND x.a_id < x.b_id
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // Link-analysis data valuation: PageRank over the cosine similarity
    // graph (same 0.45-threshold edges as q_pl_cos_pairs, undirected),
    // 3 power iterations, damping 0.85. The oracle unrolls the identical
    // iterations in CTEs.
    // Per-node triangles + local clustering coefficient (r10) via the
    // degree-orientation algorithm (acyclic edge direction from the
    // (degree, id)-smaller endpoint → O(√|E|) out-degree even on hubs —
    // the skew bound that keeps the wedge self-join from exploding).
    // Pure integer outputs; the oracle replays orientation, wedge close
    // and counts exactly.
    Q("q_pl_triangles",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // deliberately NOT cached (r17, measured): triangles is one action,
        // and ReuseExchange already dedups the miner's shared exchange —
        // a cache only added columnar-materialization overhead (5.6→6.2 s)
        val pairs = Similarity.cosinePairs(emb, 0.45)
          .select(col("vec_a").as("a"), col("vec_b").as("b"))
        graft.pipeline.Graph.triangles(pairs, emb.select(col("vec_id").as("id")))
          .orderBy("id")
      },
      Some(s"""WITH $embCte,
              |pr AS (
              |  SELECT a.vec_id AS a, b.vec_id AS b
              |  FROM e a JOIN e b ON a.vec_id < b.vec_id
              |  WHERE ${cosSql("a.v", "b.v")} >= 0.45
              |),
              |dg AS (SELECT id, count(*) AS deg
              |       FROM (SELECT a AS id FROM pr UNION ALL SELECT b FROM pr)
              |       GROUP BY 1),
              |orient AS (
              |  SELECT CASE WHEN (da.deg, pr.a) < (db.deg, pr.b) THEN pr.a ELSE pr.b END AS src,
              |         CASE WHEN (da.deg, pr.a) < (db.deg, pr.b) THEN pr.b ELSE pr.a END AS dst,
              |         CASE WHEN (da.deg, pr.a) < (db.deg, pr.b) THEN db.deg ELSE da.deg END AS ddeg
              |  FROM pr JOIN dg da ON pr.a = da.id JOIN dg db ON pr.b = db.id
              |),
              |tri AS (
              |  SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
              |  FROM orient o1 JOIN orient o2
              |    ON o1.src = o2.src AND (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst)
              |  JOIN orient o3 ON o3.src = o1.dst AND o3.dst = o2.dst
              |),
              |tn AS (SELECT id, count(*) AS t
              |       FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
              |             UNION ALL SELECT z FROM tri)
              |       GROUP BY 1)
              |SELECT e.vec_id AS id,
              |       CAST(coalesce(dg.deg, 0) AS BIGINT) AS degree,
              |       CAST(coalesce(tn.t, 0) AS BIGINT) AS triangles,
              |       CASE WHEN coalesce(dg.deg, 0) >= 2
              |            THEN floor(2.0 * coalesce(tn.t, 0) / (dg.deg * (dg.deg - 1)) * 1e4 + 0.5) / 1e4
              |            ELSE 0.0 END AS coeff
              |FROM e LEFT JOIN dg ON e.vec_id = dg.id LEFT JOIN tn ON e.vec_id = tn.id
              |ORDER BY id""".stripMargin)),

    // k-core membership (k = 3) over the cosine-0.3 similarity graph
    // (denser threshold than q_pl_triangles' 0.45, where the 3-core is
    // empty; at 0.3 the peel runs 8-10 real rounds at the small SFs): the dense mutual-support kernel that
    // degree alone overcounts (a hub with peripheral neighbors peels
    // away). The oracle unrolls the peel to the operator's maxIters
    // fixed rounds — extra rounds past the fixpoint are no-ops, and the
    // Spark side fails loudly if 16 rounds don't converge, so
    // convergence-within-unroll is part of the gated contract.
    Q("q_pl_kcore",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // cache: round-1 degrees + the peel base re-reference the miner
        val pairs = Similarity.cosinePairs(emb, 0.3)
          .select(col("vec_a").as("a"), col("vec_b").as("b")).cache()
        graft.pipeline.Graph.kCore(pairs, k = 3, maxIters = 16).orderBy("id")
      },
      Some {
        val rounds = (1 to 16).map { i =>
          s"""d$i AS MATERIALIZED (
             |  SELECT id, count(*) AS deg FROM (
             |    SELECT a AS id FROM pr
             |    WHERE a IN (SELECT id FROM n${i - 1}) AND b IN (SELECT id FROM n${i - 1})
             |    UNION ALL
             |    SELECT b FROM pr
             |    WHERE a IN (SELECT id FROM n${i - 1}) AND b IN (SELECT id FROM n${i - 1})
             |  ) GROUP BY 1),
             |n$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= 3)""".stripMargin
        }.mkString(",\n")
        s"""WITH $embCte,
           |pr AS MATERIALIZED (
           |  SELECT a.vec_id AS a, b.vec_id AS b
           |  FROM e a JOIN e b ON a.vec_id < b.vec_id
           |  WHERE ${cosSql("a.v", "b.v")} >= 0.3
           |),
           |n0 AS MATERIALIZED (SELECT DISTINCT id FROM
           |       (SELECT a AS id FROM pr UNION ALL SELECT b FROM pr)),
           |$rounds
           |SELECT id, CAST(deg AS BIGINT) AS deg FROM d16 WHERE deg >= 3
           |ORDER BY id""".stripMargin
      }),

    // FULL core decomposition (r12): every node's core number in one run
    // (Graph.coreNumbers, iterated h-index — Lü et al. 2016), on the SAME
    // similarity graph as q_pl_kcore so PipelineSpec can pin the duality
    // core_number >= k ⟺ kCore(k) membership. The oracle unrolls the
    // same 12 h-index rounds with MATERIALIZED CTEs (plain CTEs re-expand
    // exponentially); Spark early-stops at the fixpoint, which makes the
    // oracle's extra rounds no-ops — convergence within 12 is part of
    // the gated contract (loud error otherwise).
    Q("q_pl_core_numbers",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // NOT cached: the bidirected build is one eager localCheckpoint
        // action whose two union arms share one reused exchange (r17)
        val pairs = Similarity.cosinePairs(emb, 0.3)
          .select(col("vec_a").as("a"), col("vec_b").as("b"))
        graft.pipeline.Graph.coreNumbers(pairs, maxIters = 12).orderBy("id")
      },
      Some {
        val rounds = (1 to 12).map { i =>
          s"""h$i AS MATERIALIZED (
             |  SELECT id, max(least(nh, rn)) AS h FROM (
             |    SELECT n.id AS id, p.h AS nh,
             |           row_number() OVER (PARTITION BY n.id ORDER BY p.h DESC) AS rn
             |    FROM nbr n JOIN h${i - 1} p ON n.nb = p.id)
             |  GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH $embCte,
           |pr AS MATERIALIZED (
           |  SELECT a.vec_id AS a, b.vec_id AS b
           |  FROM e a JOIN e b ON a.vec_id < b.vec_id
           |  WHERE ${cosSql("a.v", "b.v")} >= 0.3
           |),
           |nbr AS MATERIALIZED (
           |  SELECT a AS id, b AS nb FROM pr UNION ALL SELECT b, a FROM pr),
           |h0 AS MATERIALIZED (SELECT id, count(*) AS h FROM nbr GROUP BY 1),
           |$rounds
           |SELECT id, CAST(h AS BIGINT) AS core FROM h12 ORDER BY id""".stripMargin
      },
      benchExtra = true),

    // Association rules (r12, Apriori setting): brand co-purchase
    // support/confidence/lift over order baskets — frequent-item pruning
    // BEFORE the pair self-join is the scale design (the infrequent tail
    // never squares). All counts exact integers; confidence/lift are
    // integer ratios rounded 1e-6; top-50 by lift through one
    // TakeOrderedAndProject.
    Q("q_pl_assoc_rules",
      (s, dir) => {
        val baskets = Tables.lineitem(s, dir)
          .join(Tables.part(s, dir),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("bk"), col("p_brand").as("it"))
        graft.pipeline.Assoc.rules(baskets, "bk", "it", minSupport = 5, topK = 50)
      },
      Some("""WITH b AS (
             |  SELECT DISTINCT l_orderkey AS bk, p_brand AS it
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |n AS (SELECT count(DISTINCT bk) AS n FROM b),
             |supp AS (SELECT it, count(*) AS s FROM b GROUP BY 1 HAVING count(*) >= 5),
             |fb AS (SELECT bk, it FROM b WHERE it IN (SELECT it FROM supp)),
             |pairs AS (
             |  SELECT x.it AS a, y.it AS b, count(*) AS sab
             |  FROM fb x JOIN fb y ON x.bk = y.bk AND x.it < y.it
             |  GROUP BY 1, 2 HAVING count(*) >= 5),
             |d AS (
             |  SELECT a AS ant, b AS cons, sab FROM pairs
             |  UNION ALL SELECT b, a, sab FROM pairs)
             |SELECT d.ant, d.cons, d.sab AS support,
             |       floor(d.sab * 1.0 / sa.s * 1e6 + 0.5) / 1e6 AS confidence,
             |       floor((d.sab * 1.0 * (SELECT n FROM n)) / (1.0 * sa.s * sb.s)
             |         * 1e6 + 0.5) / 1e6 AS lift
             |FROM d JOIN supp sa ON d.ant = sa.it JOIN supp sb ON d.cons = sb.it
             |ORDER BY lift DESC, confidence DESC, ant, cons LIMIT 50""".stripMargin),
      benchExtra = true),

    // Newman modularity (Graph.modularity) of the brand partition over
    // the co-purchase graph (parts sharing an order, a<b, distinct) —
    // the community-QUALITY metric missing next to the community
    // DETECTORS (LPA, dup clusters): Q_c = L_c/m − (d_c/2m)² per label,
    // Σ over labels answers "does this partition beat random wiring".
    // All node-keyed equi-joins + label-sized aggregates; m rides a
    // one-row broadcast meta frame. Floats derive from identical
    // integers through the identical op sequence on both engines.
    Q("q_pl_modularity",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        // deliberately NOT cached (r17, measured): one action, the three
        // edge reads share the distinct's reused exchange — caching the
        // multi-million-row pair frame DOUBLED cpu (38→69 s at sf0.1)
        val pairs = li.select(col("l_orderkey"), col("l_partkey").as("a"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
          .filter(col("a") < col("b"))
          .select(col("a"), col("b")).distinct()
        val labels = Tables.part(s, dir)
          .select(col("p_partkey").as("node"), col("p_brand").as("label"))
        graft.pipeline.Graph.modularity(pairs, labels).orderBy("label")
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
             |  FROM lineitem l1 JOIN lineitem l2
             |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
             |m AS (SELECT count(*) * 1.0 AS m FROM e0),
             |dg AS (SELECT id, count(*) AS d
             |       FROM (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
             |       GROUP BY 1),
             |lab AS (SELECT p_partkey AS node, p_brand AS label FROM part),
             |degc AS (SELECT label, CAST(sum(d) AS BIGINT) AS deg_sum
             |         FROM dg JOIN lab ON dg.id = lab.node GROUP BY 1),
             |intra AS (SELECT la.label AS label, count(*) AS intra_edges
             |          FROM e0 JOIN lab la ON e0.a = la.node
             |          JOIN lab lb ON e0.b = lb.node
             |          WHERE la.label = lb.label GROUP BY 1)
             |SELECT degc.label AS label, deg_sum,
             |       CAST(coalesce(intra_edges, 0) AS BIGINT) AS intra_edges,
             |       floor((coalesce(intra_edges, 0) / m -
             |              (deg_sum / (2.0 * m)) * (deg_sum / (2.0 * m))) * 1e4 + 0.5) / 1e4
             |         AS q_contrib
             |FROM degc LEFT JOIN intra ON degc.label = intra.label CROSS JOIN m
             |ORDER BY 1""".stripMargin)),

    // Personalized PageRank (r10): teleport to the vec_id<10 seed set —
    // the "find more like these" expansion primitive; rank concentrates
    // in the seeds' neighborhood and top non-seed ids are the expansion
    // candidates. Oracle unrolls the 3 seeded iterations.
    Q("q_pl_ppr",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // cache: the blocked all-pairs cosine miner feeds deg + the power
        // iterations — same one-materialization shape as q_pl_centrality_knn
        val edges = graft.pipeline.Graph.undirected(
          Similarity.cosinePairs(emb, 0.45), "vec_a", "vec_b").cache()
        graft.pipeline.Graph.pageRankPersonalized(edges,
            emb.select(col("vec_id").as("id")),
            emb.filter(col("vec_id") < 10).select(col("vec_id").as("id")),
            nSeeds = 10L, iters = 3)
          .select(col("id"), (floor(col("rank") * 1e6 + 0.5) / 1e6).as("rank"))
          .orderBy("id")
      },
      Some(s"""WITH $embCte,
              |pr AS (
              |  SELECT a.vec_id AS a, b.vec_id AS b
              |  FROM e a JOIN e b ON a.vec_id < b.vec_id
              |  WHERE ${cosSql("a.v", "b.v")} >= 0.45
              |),
              |ed AS (SELECT a AS src, b AS dst FROM pr
              |       UNION ALL SELECT b AS src, a AS dst FROM pr),
              |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
              |r0 AS (SELECT vec_id AS id,
              |              CASE WHEN vec_id < 10 THEN 0.1 ELSE 0.0 END AS rank
              |       FROM e),
              |${pprIter("0", "1")},
              |${pprIter("1", "2")},
              |${pprIter("2", "3")}
              |SELECT id, floor(rank * 1e6 + 0.5) / 1e6 AS rank
              |FROM r3 ORDER BY id""".stripMargin)),

    Q("q_pl_centrality",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // cache: same one-materialization shape as q_pl_centrality_knn
        val edges = graft.pipeline.Graph.undirected(
          Similarity.cosinePairs(emb, 0.45), "vec_a", "vec_b").cache()
        graft.pipeline.Graph.pageRank(edges,
            emb.select(col("vec_id").as("id")), emb.count(), iters = 3)
          .select(col("id"), (floor(col("rank") * 1e6 + 0.5) / 1e6).as("rank"))
          .orderBy("id")
      },
      Some(
        s"""WITH $embCte,
           |pr AS (
           |  SELECT a.vec_id AS a, b.vec_id AS b
           |  FROM e a JOIN e b ON a.vec_id < b.vec_id
           |  WHERE ${cosSql("a.v", "b.v")} >= 0.45
           |),
           |ed AS (SELECT a AS src, b AS dst FROM pr
           |       UNION ALL SELECT b AS src, a AS dst FROM pr),
           |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
           |r0 AS (SELECT vec_id AS id, 1.0 / (SELECT n FROM nn) AS rank FROM e),
           |${prIter("0", "1")},
           |${prIter("1", "2")},
           |${prIter("2", "3")}
           |SELECT id, floor(rank * 1e6 + 0.5) / 1e6 AS rank
           |FROM r3 ORDER BY id""".stripMargin)),

    // Retrieval eval: precision/recall/NDCG@20 per labeled query.
    Q("q_ann_eval",
      (s, dir) => Similarity.retrievalEval(Tables.embeddings(s, dir),
        nQueries = 10, k = 20).orderBy("q_id"),
      Some(s"""WITH el AS (
              |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v, label
              |  FROM embeddings
              |),
              |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label
              |      FROM el WHERE vec_id < 10),
              |sc AS (
              |  SELECT q_id, q_label, vec_id, label,
              |         row_number() OVER (PARTITION BY q_id
              |             ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
              |  FROM el CROSS JOIN q WHERE vec_id != q_id
              |),
              |top AS (
              |  SELECT *, CASE WHEN label = q_label THEN 1.0 ELSE 0.0 END AS rel
              |  FROM sc WHERE rank <= 20
              |),
              |rt AS (
              |  SELECT q.q_id, count(*) AS n_rel
              |  FROM el JOIN q ON el.label = q.q_label AND el.vec_id != q.q_id
              |  GROUP BY 1
              |),
              |ag AS (
              |  SELECT q_id, sum(rel) AS hits,
              |         sum(rel / log2(rank + 1)) AS dcg
              |  FROM top GROUP BY q_id
              |)
              |SELECT ag.q_id, rt.n_rel,
              |       floor(hits / 20.0 * 1e4 + 0.5) / 1e4 AS p_at_k,
              |       floor(hits / rt.n_rel * 1e4 + 0.5) / 1e4 AS r_at_k,
              |       floor(dcg / list_reduce(
              |           [1.0 / log2(i + 1) for i in range(1, least(rt.n_rel, 20) + 1)],
              |           (x, y) -> x + y) * 1e4 + 0.5) / 1e4 AS ndcg
              |FROM ag JOIN rt USING (q_id) ORDER BY q_id""".stripMargin)),

    // Matryoshka truncation eval: recall@5 of 16-dim-prefix retrieval vs
    // the full 64-dim space — the check before serving truncated
    // embeddings. Both retrievals exact, so the oracle replays both and
    // intersects.
    Q("q_ann_matryoshka",
      (s, dir) => Similarity.matryoshkaEval(Tables.embeddings(s, dir),
        nQueries = 10, k = 5, dims = 16).orderBy("q_id"),
      Some(s"""WITH $embCte,
              |tr AS (SELECT vec_id, v[1:16] AS v FROM e),
              |qf AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
              |qt AS (SELECT vec_id AS q_id, v AS qv FROM tr WHERE vec_id < 10),
              |topf AS (
              |  SELECT q_id, vec_id,
              |         row_number() OVER (PARTITION BY q_id
              |             ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
              |  FROM e CROSS JOIN qf WHERE vec_id != q_id),
              |topt AS (
              |  SELECT q_id, vec_id,
              |         row_number() OVER (PARTITION BY q_id
              |             ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
              |  FROM tr CROSS JOIN qt WHERE vec_id != q_id),
              |f5 AS (SELECT q_id, vec_id FROM topf WHERE rank <= 5),
              |t5 AS (SELECT q_id, vec_id FROM topt WHERE rank <= 5),
              |hits AS (SELECT q_id, count(*) AS n_hit
              |         FROM t5 JOIN f5 USING (q_id, vec_id) GROUP BY 1)
              |SELECT q.q_id, coalesce(n_hit, 0) AS n_hit,
              |       floor(coalesce(n_hit, 0) / 5.0 * 1e4 + 0.5) / 1e4 AS recall
              |FROM (SELECT DISTINCT q_id FROM f5) q
              |LEFT JOIN hits USING (q_id) ORDER BY q_id""".stripMargin)),

    // Recall curve of the Hamming serving route vs exact retrieval at
    // k ∈ {1, 5, 10} — the acceptance eval before trusting the 16-byte
    // candidate scan in production. Oracle replays the index algorithm
    // (per-k candidate pools — NOT prefixes of each other) AND the exact
    // baseline, then intersects.
    Q("q_ann_recall_curve",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        Seq(1, 5, 10).map { k =>
          val ex = Similarity.bruteForceTopK(emb, q, k).select(col("q_id"), col("vec_id"))
          val hm = Similarity.hammingTopK(emb, q, k).select(col("q_id"), col("vec_id"))
          val hits = hm.join(ex, Seq("q_id", "vec_id"))
            .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
          ex.select("q_id").distinct().join(hits, Seq("q_id"), "left")
            .agg(
              (floor(avg(coalesce(col("n_hit"), lit(0L)) / k.toDouble) * 1e4 + 0.5) / 1e4)
                .as("recall"),
              count(lit(1)).as("n_queries"))
            .select(lit(k.toLong).as("k"), col("recall"), col("n_queries"))
        }.reduce(_ unionAll _).orderBy("k")
      },
      Some {
        val perK = Seq(1, 5, 10).map { k =>
          s"""cand$k AS (
             |  SELECT a.vec_id AS q_id, a.v AS qv, b.vec_id, b.v,
             |         row_number() OVER (PARTITION BY a.vec_id
             |           ORDER BY bit_count(xor(a.sig_lo, b.sig_lo))
             |                  + bit_count(xor(a.sig_hi, b.sig_hi)), b.vec_id) AS crank
             |  FROM sig a JOIN sig b ON a.vec_id != b.vec_id
             |  WHERE a.vec_id < 10),
             |knn$k AS (
             |  SELECT q_id, vec_id,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos DESC, vec_id) AS rank
             |  FROM (SELECT q_id, vec_id, ${cosSql("qv", "v")} AS cos
             |        FROM cand$k WHERE crank <= ${4 * k})),
             |r$k AS (
             |  SELECT CAST($k AS BIGINT) AS k,
             |         floor(avg(coalesce(n_hit, 0) / $k.0) * 1e4 + 0.5) / 1e4 AS recall,
             |         count(*) AS n_queries
             |  FROM (SELECT DISTINCT q_id FROM ex WHERE rank <= $k) q
             |  LEFT JOIN (
             |    SELECT h.q_id, count(*) AS n_hit
             |    FROM (SELECT q_id, vec_id FROM knn$k WHERE rank <= $k) h
             |    JOIN (SELECT q_id, vec_id FROM ex WHERE rank <= $k) x
             |      USING (q_id, vec_id) GROUP BY 1) hits USING (q_id))""".stripMargin
        }.mkString(",\n")
        s"""WITH $embCte,
           |$sigCte,
           |qf AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
           |ex AS (
           |  SELECT q_id, vec_id,
           |         row_number() OVER (PARTITION BY q_id
           |           ORDER BY ${cosSql("qv", "v")} DESC, vec_id) AS rank
           |  FROM e CROSS JOIN qf WHERE vec_id != q_id),
           |$perK
           |SELECT * FROM r1 UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r10
           |ORDER BY k""".stripMargin
      }),

    // Index-backed mutual NN — the corpus-scale route for q_ann_mutual_nn:
    // top-1 per vector via the Hamming candidate scan + exact rerank
    // (hammingTopK k=1, candMult=64), then the unchanged mutuality join.
    // The ALGORITHM is the contract (the q_ann_hamming pattern): the
    // oracle replays the integer Hamming ranking and the rerank, not
    // brute force.
    Q("q_ann_mutual_nn_idx",
      (s, dir) => Similarity.mutualNnIdx(Tables.embeddings(s, dir))
        .orderBy("vec_a", "vec_b"),
      Some(s"""WITH $embCte,
              |$sigCte,
              |${hammingKnnCtes(1, 64)},
              |nn AS (SELECT q_id AS a_id, vec_id AS b_id,
              |              floor(cos * 1e6 + 0.5) / 1e6 AS cos
              |       FROM knn WHERE rank <= 1)
              |SELECT x.a_id AS vec_a, x.b_id AS vec_b, x.cos AS cos
              |FROM nn x JOIN nn y ON x.a_id = y.b_id AND x.b_id = y.a_id
              |                   AND x.a_id < x.b_id
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // Sub-quadratic kNN graph (r11): Hamming pigeonhole bands → candidate
    // equi-join → exact Hamming rank → cosine rerank. The BANDING is the
    // contract (the oracle replays the 8×8-bit band collisions exactly,
    // same stance as the LSH dedup gates) — this is the corpus-as-queries
    // construction path that replaces the Θ(n²/limit) chunked literal
    // scans for kNN-graph builds at scale. PipelineSpec pins its recall
    // against the exact hammingTopK route at gate scale.
    Q("q_ann_knn_graph",
      (s, dir) => Similarity.knnGraphBanded(Tables.embeddings(s, dir), 4,
          bands = 8, candMult = 4)
        .orderBy("q_id", "rank"),
      Some(s"""WITH $embCte,
              |$sigCte,
              |${bandedKnnCtes(4, 4, 8)}
              |SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
              |       floor(cos * 1e6 + 0.5) / 1e6 AS cos
              |FROM knn WHERE rank <= 4 ORDER BY q_id, rank""".stripMargin)),

    // PageRank centrality over the BANDED kNN graph (r11): the full
    // sub-quadratic wiring the r10 verdict asked for — edge GENERATION
    // is knnGraphBanded (band collisions only, never a corpus scan per
    // query), the PageRank tail identical to q_pl_centrality_knn. At
    // 100 TB this is the graph-analytics construction path; the exact
    // hammingTopK route stays gated as its quality reference.
    Q("q_pl_centrality_banded",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val knn = Similarity.knnGraphBanded(emb, 4, bands = 8, candMult = 4)
        val edges = graft.pipeline.Graph.undirected(
          knn.select(col("q_id").as("vec_a"), col("vec_id").as("vec_b")),
          "vec_a", "vec_b").distinct().cache()
        graft.pipeline.Graph.pageRank(edges,
            emb.select(col("vec_id").as("id")), emb.count(), iters = 3)
          .select(col("id"), (floor(col("rank") * 1e6 + 0.5) / 1e6).as("rank"))
          .orderBy("id")
      },
      Some(s"""WITH $embCte,
              |$sigCte,
              |${bandedKnnCtes(4, 4, 8)},
              |dpr AS (SELECT q_id AS a, vec_id AS b FROM knn WHERE rank <= 4),
              |ed AS (SELECT DISTINCT src, dst FROM (
              |  SELECT a AS src, b AS dst FROM dpr
              |  UNION ALL SELECT b AS src, a AS dst FROM dpr)),
              |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
              |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
              |r0 AS (SELECT vec_id AS id, 1.0 / (SELECT n FROM nn) AS rank FROM e),
              |${prIter("0", "1")},
              |${prIter("1", "2")},
              |${prIter("2", "3")}
              |SELECT id, floor(rank * 1e6 + 0.5) / 1e6 AS rank
              |FROM r3 ORDER BY id""".stripMargin)),

    // kNN-graph centrality — the corpus-scale route for q_pl_centrality:
    // edges = symmetrized distinct top-4 Hamming-index neighbors (the
    // standard similarity-graph construction at scale; no threshold, no
    // all-pairs), same Graph.pageRank tail. The exact 0.45-threshold
    // variant stays gated for small scale factors.
    Q("q_pl_centrality_knn",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val knn = Similarity.hammingTopK(emb, emb, 4, candMult = 4)
        // cache: the kNN edge subtree is referenced by deg + every power
        // iteration (4x); one materialization instead of four Hamming scans
        val edges = graft.pipeline.Graph.undirected(
          knn.select(col("q_id").as("vec_a"), col("vec_id").as("vec_b")),
          "vec_a", "vec_b").distinct().cache()
        graft.pipeline.Graph.pageRank(edges,
            emb.select(col("vec_id").as("id")), emb.count(), iters = 3)
          .select(col("id"), (floor(col("rank") * 1e6 + 0.5) / 1e6).as("rank"))
          .orderBy("id")
      },
      Some(s"""WITH $embCte,
              |$sigCte,
              |${hammingKnnCtes(4, 4)},
              |dpr AS (SELECT q_id AS a, vec_id AS b FROM knn WHERE rank <= 4),
              |ed AS (SELECT DISTINCT src, dst FROM (
              |  SELECT a AS src, b AS dst FROM dpr
              |  UNION ALL SELECT b AS src, a AS dst FROM dpr)),
              |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
              |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
              |r0 AS (SELECT vec_id AS id, 1.0 / (SELECT n FROM nn) AS rank FROM e),
              |${prIter("0", "1")},
              |${prIter("1", "2")},
              |${prIter("2", "3")}
              |SELECT id, floor(rank * 1e6 + 0.5) / 1e6 AS rank
              |FROM r3 ORDER BY id""".stripMargin)),

    // Exact heavy hitters (> 1% of corpus word mass) via the two-pass
    // distributed Misra-Gries sketch: per-partition bounded-memory
    // candidate pass + exact recount of the candidate superset. The oracle
    // is the plain exact threshold count — the sketch changes WHAT
    // SHUFFLES (candidates only, never the full vocabulary), not the
    // answer.
    Q("q_pl_heavy_hitters",
      (s, dir) => TextAnalysis.heavyHitters(Tables.documents(s, dir), 100)
        .orderBy(col("cnt").desc, col("word")),
      Some(s"""WITH $wordsCte,
              |wx AS (SELECT unnest(w) AS word FROM words),
              |wf AS (SELECT word FROM wx WHERE len(word) > 0),
              |tot AS (SELECT count(*) AS total FROM wf),
              |c AS (SELECT word, count(*) AS cnt FROM wf GROUP BY 1)
              |SELECT word, cnt, total FROM c CROSS JOIN tot
              |WHERE cnt * 100 > total
              |ORDER BY cnt DESC, word""".stripMargin)),

    // Count–min sketch point-frequency estimation (r10): the mergeable
    // fixed-size summary complementing Misra–Gries — MG answers "which
    // words are heavy", CMS answers "how often is THIS word". The oracle
    // rebuilds the 4×256 counter table from the SAME md5-derived affine
    // hash schedule (generated from TextAnalysis.CmsA/CmsB — the
    // replay-the-full-schedule lesson) and takes the same mins, so
    // estimates hash-match cell for cell; est ≥ exact is visible per row.
    Q("q_pl_cms",
      (s, dir) => TextAnalysis.cmsEstimate(Tables.documents(s, dir)),
      Some {
        import graft.pipeline.TextAnalysis.{CmsA, CmsB, CmsP}
        val width = 256
        def bSql(i: Int) = s"((hv * ${CmsA(i)} + ${CmsB(i)}) % $CmsP) % $width"
        val cellRows = CmsA.indices.map(i =>
          s"SELECT $i AS row_i, ${bSql(i)} AS bucket, count(*) AS c FROM h GROUP BY 2")
          .mkString(" UNION ALL ")
        val prRows = CmsA.indices.map(i =>
          s"SELECT word, exact, $i AS row_i, ${bSql(i)} AS bucket FROM ph")
          .mkString(" UNION ALL ")
        s"""WITH $wordsCte,
           |wx AS (SELECT unnest(w) AS word FROM words),
           |wf AS (SELECT word FROM wx WHERE len(word) > 0),
           |h AS (SELECT ${h31("word")} AS hv FROM wf),
           |cells AS ($cellRows),
           |exact AS (SELECT word, count(*) AS exact FROM wf GROUP BY 1),
           |probes AS (SELECT word, exact FROM exact ORDER BY exact DESC, word LIMIT 20),
           |ph AS (SELECT word, exact, ${h31("word")} AS hv FROM probes),
           |pr AS ($prRows)
           |SELECT pr.word, pr.exact, min(c.c) AS cms_est
           |FROM pr JOIN cells c ON pr.row_i = c.row_i AND pr.bucket = c.bucket
           |GROUP BY 1, 2 ORDER BY exact DESC, word""".stripMargin
      }),

    // Fuzzy (bounded edit distance) near-dup pairs: two-token blocking +
    // length band + Levenshtein <= 20 on the 80-char normalized prefix.
    // The blocking algorithm is the contract (the oracle replays it) —
    // same stance as the banding gates.
    Q("q_pl_edit_dist",
      (s, dir) => Dedup.editDistancePairs(Tables.documents(s, dir), 20, 80)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH n AS (
             |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
             |  FROM documents),
             |d AS (
             |  SELECT doc_id, substr(t, 1, 80) AS p,
             |         concat_ws(' ', string_split(t, ' ')[1], string_split(t, ' ')[2]) AS blk
             |  FROM n)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
             |FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
             |            AND abs(len(a.p) - len(b.p)) <= 20
             |WHERE levenshtein(a.p, b.p) <= 20
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Incremental dedup: the corpus (doc_id < 400) is indexed at rest
    // (band rows + shingle sets, parquet); the new batch (doc_id >= 400)
    // probes the index — the corpus is never re-shingled. The oracle is
    // the SAME brute-force verified pair set as q_pl_minhash_lsh
    // restricted to batch x corpus (banding recall ≈ 1 at threshold 0.8),
    // so this gate pins the index round-trip end to end.
    Q("q_pl_incr_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // fixed per-SF path, overwritten per invocation (no /tmp leak)
        val idx = s"target/gate-tmp/mhidx-${dir.replace('/', '_')}/index"
        Dedup.minhashIndexWrite(docs.filter(col("doc_id") < 400), idx)
        Dedup.minhashIndexProbe(s, docs.filter(col("doc_id") >= 400), idx, 0.8)
          .orderBy("batch_id", "corpus_id")
      },
      Some(s"""WITH $wordsCte, $shinglesCte, $verifiedPairsCte
              |SELECT doc_b AS batch_id, doc_a AS corpus_id, jaccard
              |FROM vp WHERE doc_a < 400 AND doc_b >= 400
              |ORDER BY batch_id, corpus_id""".stripMargin)),

    // Label-propagation communities over the same kNN similarity graph as
    // q_pl_centrality_knn: 3 synchronous deterministic rounds (most
    // frequent neighbor label, ties to the smaller label). The oracle
    // unrolls the identical rounds.
    Q("q_pl_communities",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val knn = Similarity.hammingTopK(emb, emb, 4, candMult = 4)
        // cache: same 4x-reference shape as q_pl_centrality_knn
        val edges = graft.pipeline.Graph.undirected(
          knn.select(col("q_id").as("vec_a"), col("vec_id").as("vec_b")),
          "vec_a", "vec_b").distinct().cache()
        graft.pipeline.Graph.labelPropagation(edges,
            emb.select(col("vec_id").as("id")), iters = 3)
          .orderBy("id")
      },
      Some(s"""WITH $embCte,
              |$sigCte,
              |${hammingKnnCtes(4, 4)},
              |dpr AS (SELECT q_id AS a, vec_id AS b FROM knn WHERE rank <= 4),
              |ed AS (SELECT DISTINCT src, dst FROM (
              |  SELECT a AS src, b AS dst FROM dpr
              |  UNION ALL SELECT b AS src, a AS dst FROM dpr)),
              |l0 AS (SELECT vec_id AS id, vec_id AS label FROM e),
              |${lpIter("0", "1")},
              |${lpIter("1", "2")},
              |${lpIter("2", "3")}
              |SELECT id, label FROM l3 ORDER BY id""".stripMargin)),

    // BPE merge training: the first 6 learned merges of the corpus (the
    // trainable-tokenizer pass of a data pipeline). The oracle unrolls
    // the identical rounds — pair counts over the distinct-word frequency
    // table, deterministic argmax, island-parity merge application.
    Q("q_pl_bpe",
      (s, dir) => TextAnalysis.bpeTrain(Tables.documents(s, dir), 6)
        .orderBy("rank"),
      Some(s"""WITH wx AS (
              |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
              |  FROM documents),
              |v0 AS MATERIALIZED (
              |  SELECT word, count(*) AS cnt, string_split(word, '') AS toks
              |  FROM wx WHERE len(word) > 0 GROUP BY word),
              |${(1 to 6).map(r => bpeRound(r - 1, r)).mkString(",\n")}
              |${(1 to 6).map(r =>
                  s"SELECT CAST($r AS BIGINT) AS rank, x, y, CAST(c AS BIGINT) AS c FROM m$r")
                 .mkString("\nUNION ALL ")}
              |ORDER BY rank""".stripMargin)),

    // Tokenize with the learned merges: k rounds over the distinct-word
    // table, one equi-join back to documents. Per-doc token counts +
    // compression ratio; the oracle replays training AND application.
    Q("q_pl_bpe_apply",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val m = TextAnalysis.bpeTrain(docs, 6).orderBy("rank")
          .select("x", "y").collect().map(r => (r.getString(0), r.getString(1))).toSeq
        TextAnalysis.bpeApply(docs, m).orderBy("doc_id")
      },
      Some(s"""WITH wx AS (
              |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
              |  FROM documents),
              |v0 AS MATERIALIZED (
              |  SELECT word, count(*) AS cnt, string_split(word, '') AS toks
              |  FROM wx WHERE len(word) > 0 GROUP BY word),
              |${(1 to 6).map(r => bpeRound(r - 1, r)).mkString(",\n")},
              |wd AS (
              |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
              |  FROM documents),
              |wdf AS (SELECT doc_id, word FROM wd WHERE len(word) > 0)
              |SELECT doc_id, count(*) AS n_words,
              |       CAST(sum(len(v6.toks)) AS BIGINT) AS n_tokens,
              |       floor(sum(len(v6.toks)) * 1.0 / count(*) * 1e4 + 0.5) / 1e4 AS avg_tpw
              |FROM wdf JOIN v6 USING (word)
              |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Model-in-the-loop curation: train a logistic-regression language/
    // quality classifier ON the corpus by distributed batch gradient
    // descent (one d+1-sum global aggregate per iteration, d+1-double
    // driver state), then score the corpus with the learned boundary.
    // The oracle replays training EXACTLY — per-iteration gradient sums
    // pre-rounded 1e-6 (the whiten/SAX stance), weight updates as
    // chained one-row CTEs (the BPE unroll pattern), decision on exact
    // dot products of the rounded final weights.
    Q("q_pl_quality_clf",
      (s, dir) => graft.pipeline.Model.logisticQuality(Tables.documents(s, dir))
        .orderBy("j"),
      Some(logregOracle(tau = 0.55, iters = 8, lr = 4.0)),
      benchExtra = true),

    // Leakage-safe holdout: the 80/10/10 split keyed on the NEAR-DUP
    // CLUSTER id, so near-identical documents can never straddle
    // train/test (hashing doc_ids does exactly that, silently inflating
    // eval scores). Same verified-pair components as q_pl_dup_clusters,
    // same integer hash-band compare as q_pl_split.
    Q("q_pl_leakage_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cl = Dedup.dupClusters(docs, Dedup.minhashLshPairs(docs, 0.8))
          .select(col("doc_id"), col("cluster_id"))
        Sampling.leakageSafeSplit(cl,
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "lsplit1")
          .orderBy("doc_id")
      },
      Some {
        val h = "CAST(concat('0x', substr(md5('lsplit1:' || CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        s"""WITH RECURSIVE $dupClusterCtes
           |SELECT doc_id, cluster_id,
           |       CASE WHEN $h < 800000 THEN 'train'
           |            WHEN $h < 900000 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM cl ORDER BY doc_id""".stripMargin
      }),

    // Deterministic training-shard layout: the global corpus shuffle a
    // training run reads, without a global sort — shard = hash60 mod k,
    // within-shard order = (hash, key) rank. One hash shuffle + per-shard
    // local sorts; k is chosen so a shard is task-sized (100 TB / 1 GB ≈
    // 100k shards). Gate pins per-shard counts, payload sums, and the
    // max position (== n−1 ⇒ positions are the contiguous 0..n−1 rank).
    Q("q_pl_shards",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.pipeline.Sampling.shardAssign(docs, "doc_id", 16, "shards1")
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            max(col("shard_pos").cast("long")).as("max_pos"))
          .orderBy("shard")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, n_chars,
             |         CAST(concat('0x', substr(md5('shards1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM documents),
             |a AS (
             |  SELECT n_chars, CAST(hv % 16 AS INTEGER) AS shard,
             |         row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) - 1 AS shard_pos
             |  FROM h)
             |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       CAST(max(shard_pos) AS BIGINT) AS max_pos
             |FROM a GROUP BY shard ORDER BY shard""".stripMargin)),

    // Winsorized robust length stats per language: clamp n_chars to the
    // group's 1e-6-pre-rounded [p05, p95] band and report the robust
    // mean next to the raw one — the outlier-proof screen boilerplate
    // pages can't drag. Exact percentile pass at gate scale
    // (percentile_approx is the one-pass 100 TB swap).
    Q("q_pl_winsorize",
      (s, dir) => graft.pipeline.Drift.winsorize(
          Tables.documents(s, dir), "lang", "n_chars")
        .orderBy("lang"),
      Some("""WITH c AS (
             |  SELECT lang,
             |         floor(quantile_cont(n_chars, 0.05) * 1e6 + 0.5) / 1e6 AS p_lo,
             |         floor(quantile_cont(n_chars, 0.95) * 1e6 + 0.5) / 1e6 AS p_hi
             |  FROM documents GROUP BY 1)
             |SELECT d.lang, count(*) AS n, p_lo, p_hi,
             |       CAST(sum(CASE WHEN d.n_chars < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
             |       CAST(sum(CASE WHEN d.n_chars > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
             |       floor(avg(d.n_chars) * 1e4 + 0.5) / 1e4 AS raw_mean,
             |       floor(avg(least(greatest(d.n_chars, p_lo), p_hi)) * 1e4 + 0.5) / 1e4 AS winsorized_mean
             |FROM documents d JOIN c USING (lang)
             |GROUP BY d.lang, p_lo, p_hi ORDER BY d.lang""".stripMargin))
  )

  /** DuckDB replay of [[graft.pipeline.Model.logisticQuality]]: unrolls
    * `iters` gradient-descent iterations as chained one-row weight CTEs.
    * Arithmetic mirrors the Spark side operation for operation — same
    * quality-component expressions, same 1e-6 μ/σ pre-round before
    * standardizing, same left-to-right z fold, same 1e-6 gradient
    * pre-round, same update association `w - g/n`.
    */
  private def logregOracle(tau: Double, iters: Int, lr: Double): String = {
    val stop = TextAnalysis.Lexicons.flatMap(_._2).distinct.map(x => s"'$x'").mkString(",")
    val comps = Seq(
      "least(len(w) / 100.0, 1.0)",
      s"least((len([x for x in w if x IN ($stop)]) * 1.0 / len(w)) * 5.0, 1.0)",
      "1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / length(text)) * 10.0, 1.0)",
      "least((length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / len(w)) / 8.0, 1.0)")
    val d = comps.size + 1
    val idx = 0 until d
    val csel = comps.zipWithIndex.map { case (c, i) => s"$c AS c$i" }.mkString(",\n         ")
    val statSel = comps.indices.map(i =>
      s"floor(avg(c$i) * 1e6 + 0.5) / 1e6 AS mu$i, floor(stddev_pop(c$i) * 1e6 + 0.5) / 1e6 AS sd$i")
      .mkString(",\n              ")
    val stdSel = comps.indices.map(i =>
      s"CASE WHEN st.sd$i > 0 THEN (f.c$i - st.mu$i) / st.sd$i ELSE 0.0 END AS x${i + 1}")
      .mkString(",\n             ")
    def z(wa: String) = idx.map(j => s"$wa.w$j * f.x$j").mkString(" + ")
    val iterCtes = (1 to iters).map { t =>
      val g = idx.map(j =>
        s"floor(sum(f.x$j * (1.0 / (1.0 + exp(-(${z("w")}))) - f.y)) * 1e6 + 0.5) / 1e6 AS g$j")
        .mkString(",\n       ")
      val u = idx.map(j => s"w.w$j - ($lr * g.g$j) / nn.c AS w$j").mkString(", ")
      s"""g$t AS (
         |SELECT $g
         |FROM fs f, w${t - 1} w),
         |w$t AS (SELECT $u FROM w${t - 1} w, g$t g, nn)""".stripMargin
    }.mkString(",\n")
    val names = Seq("bias", "x_words", "x_stop", "x_punct", "x_awl")
    val weightRows = idx.map { j =>
      val head = if (j == 0) s"CAST(0 AS BIGINT) AS j, 'bias' AS feature, w0 AS weight"
      else s"$j, '${names(j)}', w$j"
      s"SELECT $head FROM wr"
    }.mkString("\n  UNION ALL ")
    // decision z matches the Spark side: bias term first, NO x0 factor
    val zDec = (s"w.w0" +: (1 until d).map(j => s"w.w$j * f.x$j")).mkString(" + ")
    s"""WITH f0 AS (
       |  SELECT $csel
       |  FROM (SELECT text, string_split_regex(lower(text), '\\s+') AS w FROM documents)
       |),
       |f AS (
       |  SELECT c0, c1, c2, c3,
       |         CASE WHEN floor((c0 * 0.3 + c1 * 0.3 + c2 * 0.2 + c3 * 0.2) * 1e4 + 0.5) / 1e4 >= $tau
       |              THEN 1.0 ELSE 0.0 END AS y
       |  FROM f0
       |),
       |st AS (SELECT $statSel FROM f),
       |fs AS (SELECT f.y, 1.0 AS x0,
       |             $stdSel
       |       FROM f, st),
       |nn AS (SELECT count(*) AS c FROM fs),
       |w0 AS (SELECT ${idx.map(j => s"0.0 AS w$j").mkString(", ")}),
       |$iterCtes,
       |wr AS (SELECT ${idx.map(j => s"floor(w$j * 1e6 + 0.5) / 1e6 AS w$j").mkString(", ")}
       |       FROM w$iters),
       |pr AS (SELECT CASE WHEN $zDec >= 0 THEN 1 ELSE 0 END AS p,
       |              CAST(f.y AS BIGINT) AS yy
       |       FROM fs f, wr w),
       |cf AS (SELECT CAST(sum(p * yy) AS BIGINT) AS tp,
       |              CAST(sum(p * (1 - yy)) AS BIGINT) AS fp,
       |              CAST(sum((1 - p) * yy) AS BIGINT) AS fn,
       |              CAST(sum((1 - p) * (1 - yy)) AS BIGINT) AS tn
       |       FROM pr)
       |SELECT j, feature, weight, tp, fp, fn, tn
       |FROM ($weightRows) t, cf
       |ORDER BY j""".stripMargin
  }
}
