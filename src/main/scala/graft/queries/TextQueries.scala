package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Boilerplate, BpeApply, BpeMerges, ChiSquareKeywords, Chunking, Contamination, CorpusPacking, Dedup, DupSpans, HybridRetrieval, IncrementalDedup, LengthBatching, LexicalStats, MixtureSampler, Multimodal, NegativeSampler, NgramLanguageModel, PostingsIndex, RepetitionScore, ScanFanout, SimilaritySearch, DupSourceMatrix, SnapshotDiff, SpanCorruption, SparseSimilarity, StratifiedSampler, TopK}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication coverage over `documents` — the
  * training-data-pipeline operators (language ID, quality scoring, token
  * counting, fingerprinting, exact/fuzzy dedup). All Spark-side logic is
  * native column expressions (codegen'd); oracles mirror them with
  * DuckDB list/regexp functions. The MinHash/SimHash gate queries run
  * the shared LSH pipelines under the md5 (`oracleHashes`) hash family
  * so DuckDB can replay them end to end; the xxhash64 production family
  * is exercised by q_dedup_minhash_recall and DedupSpec.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Stored-fingerprint-index path for the X205 queries: ONE temp root
    * per JVM (re-executions in the same process reuse and overwrite it
    * — writeIndex is a static overwrite, so reuse is clean and a bench
    * run's 4+ executions don't accrete 4+ full index copies in /tmp),
    * keyed inside by the full sanitized data dir + query tag (two
    * datasets or the two X205 queries never share an index; two
    * PROCESSES get distinct roots from createTempDirectory).
    */
  private lazy val fpIndexRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_fpidx_")
  private def fpIndexPath(dir: String, tag: String): String =
    fpIndexRoot.resolve(dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + tag).toString

  private val enStop = Seq("the", "and", "of", "is", "with")
  private val enStopSql = "['the', 'and', 'of', 'is', 'with']"
  private val toksSql = "regexp_split_to_array(lower(text), '\\s+')"

  val queries: Seq[Q] = Seq(

    // Token counting: whitespace + BPE-ish regex (LLM-token proxy).
    Q("q_text_token_stats",
      s"""SELECT doc_id,
         |       cast(len($toksSql) AS int) AS n_tokens,
         |       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS int)
         |         AS n_bpeish,
         |       round(CASE WHEN length(text) = 0 THEN 0.0
         |                  ELSE cast(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS double)
         |                       / cast(length(text) AS double) END, 4) AS punct_ratio,
         |       round(CASE WHEN len($toksSql) = 0 THEN 0.0
         |                  ELSE cast(list_aggregate(list_transform($toksSql, x -> length(x)), 'sum') AS double)
         |                       / cast(len($toksSql) AS double) END, 4) AS mean_tok_len
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.bpeishTokenCount(col("text")).as("n_bpeish"),
          round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextFunctions.meanTokenLength(col("text")), 4).as("mean_tok_len"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring (C4/Gopher-style heuristic gates).
    Q("q_text_quality",
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    CASE WHEN len($toksSql) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END AS len_ok,
         |    CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
         |               ELSE cast(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS double)
         |                    / cast(length(text) AS double) END) <= 0.2
         |         THEN 1.0 ELSE 0.0 END AS punct_ok,
         |    CASE WHEN (CASE WHEN len($toksSql) = 0 THEN 0.0
         |               ELSE cast(len(list_filter($toksSql, x -> list_contains($enStopSql, x))) AS double)
         |                    / cast(len($toksSql) AS double) END) >= 0.05
         |         THEN 1.0 ELSE 0.0 END AS stop_ok,
         |    CASE WHEN (CASE WHEN len($toksSql) = 0 THEN 0.0
         |               ELSE cast(list_aggregate(list_transform($toksSql, x -> length(x)), 'sum') AS double)
         |                    / cast(len($toksSql) AS double) END) BETWEEN 2.0 AND 12.0
         |         THEN 1.0 ELSE 0.0 END AS meanlen_ok
         |  FROM documents)
         |SELECT doc_id, (len_ok + punct_ok + stop_ok + meanlen_ok) / 4 AS quality
         |FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.qualityScore(col("text"), enStop).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Language ID (marker-stopword argmax) vs the labeled lang column.
    Q("q_text_langid_confusion", {
      val langs = TextFunctions.langMarkers.keys.toSeq.sorted
      val scoreExprs = langs.map { l =>
        val markers = TextFunctions.langMarkers(l).map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_filter($toksSql, x -> list_contains($markers, x))) AS s_$l"
      }.mkString(",\n         |    ")
      val gmax = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val caseChain = langs.map(l => s"WHEN s_$l = gm THEN '$l'").mkString(" ")
      s"""WITH scores AS (
         |  SELECT doc_id, lang,
         |    $scoreExprs
         |  FROM documents),
         |picked AS (
         |  SELECT *, $gmax AS gm FROM scores)
         |SELECT lang, CASE WHEN gm = 0 THEN 'und' $caseChain END AS pred_lang,
         |       count(*) AS n_docs
         |FROM picked GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin
    }) { (s, dir) =>
      // tokenize ONCE into a projected column; CollapseProject keeps the
      // non-cheap split() from being re-inlined into each language score
      t(s, dir, "documents")
        .select(col("lang"), TextFunctions.tokens(col("text")).as("_toks"))
        .select(col("lang"), TextFunctions.langIdFromTokens(col("_toks")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("pred_lang"))
    },

    // X163 inter-annotator agreement: Cohen's κ between the declared
    // lang column and the heuristic language-ID — chance-corrected
    // label-QA over the same confusion matrix as
    // q_text_langid_confusion. Exact-long confusion + marginals; the
    // only floats are the two closing divisions, so κ hash-replays.
    Q("q_text_kappa_langid", {
      val langs = TextFunctions.langMarkers.keys.toSeq.sorted
      val scoreExprs = langs.map { l =>
        val markers = TextFunctions.langMarkers(l).map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_filter($toksSql, x -> list_contains($markers, x))) AS s_$l"
      }.mkString(",\n         |    ")
      val gmax = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val caseChain = langs.map(l => s"WHEN s_$l = gm THEN '$l'").mkString(" ")
      s"""WITH scores AS (
         |  SELECT doc_id, lang,
         |    $scoreExprs
         |  FROM documents),
         |picked AS (
         |  SELECT *, $gmax AS gm FROM scores),
         |conf AS (
         |  SELECT lang AS a, CASE WHEN gm = 0 THEN 'und' $caseChain END AS b,
         |         count(*) AS n
         |  FROM picked GROUP BY 1, 2),
         |tot AS (SELECT sum(n) AS n,
         |               coalesce(sum(n) FILTER (WHERE a = b), 0) AS n_agree
         |        FROM conf),
         |rm AS (SELECT a, sum(n) AS rn FROM conf GROUP BY 1),
         |cm AS (SELECT b, sum(n) AS cn FROM conf GROUP BY 1),
         |pe AS (SELECT coalesce(sum(rm.rn * cm.cn), 0) AS penum
         |       FROM rm JOIN cm ON rm.a = cm.b)
         |SELECT cast(tot.n AS bigint) AS n_items,
         |       cast(tot.n_agree AS bigint) AS n_agree,
         |       round(tot.n_agree / cast(tot.n AS double), 6) AS po,
         |       round(penum / (cast(tot.n AS double) * tot.n), 6) AS pe,
         |       round((tot.n_agree / cast(tot.n AS double)
         |               - penum / (cast(tot.n AS double) * tot.n))
         |             / (1.0 - penum / (cast(tot.n AS double) * tot.n)), 6) AS kappa
         |FROM tot CROSS JOIN pe""".stripMargin
    }) { (s, dir) =>
      graft.operators.AnnotatorAgreement.kappa(
        // fan out first (guide §2.5): the per-doc language scoring is the
        // query's whole cost and runs fused onto the one-task scan
        ScanFanout.byKey(t(s, dir, "documents"), col("doc_id"))
          .select(col("lang").as("a"),
            TextFunctions.langIdFromTokens(TextFunctions.tokens(col("text"))).as("b")),
        "a", "b")
    },

    // X165 vocabulary-growth (Heaps'-law) audit: new token types per
    // 100-document slice, attributed to the FIRST containing doc —
    // exact counts, one explode-aggregate for first occurrences, and a
    // cumulative window only over the ≤ #buckets rollup.
    Q("q_text_vocab_growth",
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ds AS (SELECT doc_id // 100 AS bucket, count(*) AS n_docs,
         |              sum(len(toks)) AS n_tokens
         |       FROM d GROUP BY 1),
         |fo AS (SELECT tok, min(doc_id) AS fd FROM (
         |         SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM d)
         |       GROUP BY 1),
         |nt AS (SELECT fd // 100 AS bucket, count(*) AS n_new FROM fo GROUP BY 1)
         |SELECT cast(bucket AS bigint) AS bucket,
         |       cast(n_docs AS bigint) AS n_docs,
         |       cast(n_tokens AS bigint) AS n_tokens,
         |       cast(coalesce(n_new, 0) AS bigint) AS n_new_types,
         |       cast(sum(coalesce(n_new, 0)) OVER (ORDER BY bucket
         |              ROWS UNBOUNDED PRECEDING) AS bigint) AS vocab_size
         |FROM ds LEFT JOIN nt USING (bucket) ORDER BY bucket""".stripMargin) { (s, dir) =>
      graft.operators.VocabGrowth.curve(t(s, dir, "documents"), "doc_id",
        TextFunctions.tokens(col("text")), bucketWidth = 100L)
    },

    // X167 blocking-quality audit: reduction ratio vs pair completeness
    // of a cheap (lang, length-bucket) blocking key against the
    // 16-char-prefix duplicate families — all pair counts from
    // group-size histograms (never materialized pairs), two closing
    // divisions only.
    Q("q_diag_blocking_audit",
      """WITH k AS (SELECT lang || ':' || (n_chars // 50) AS b,
        |                  substr(text, 1, 16) AS t
        |           FROM documents),
        |n AS (SELECT count(*) AS n FROM k),
        |cb AS (SELECT sum(c * (c - 1) // 2) AS cand
        |       FROM (SELECT count(*) AS c FROM k GROUP BY b)),
        |tb AS (SELECT sum(c * (c - 1) // 2) AS tru
        |       FROM (SELECT count(*) AS c FROM k GROUP BY t)),
        |cv AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS cov
        |       FROM (SELECT count(*) AS c FROM k GROUP BY t, b))
        |SELECT cast(n.n AS bigint) AS n_rows,
        |       cast(n.n * (n.n - 1) // 2 AS bigint) AS n_pairs,
        |       cast(cand AS bigint) AS n_cand_pairs,
        |       cast(tru AS bigint) AS n_true_pairs,
        |       cast(cov AS bigint) AS n_covered,
        |       round(1.0 - cand / cast(n.n * (n.n - 1) // 2 AS double), 6) AS reduction_ratio,
        |       round(cov / cast(tru AS double), 6) AS completeness
        |FROM n, cb, tb, cv""".stripMargin) { (s, dir) =>
      graft.operators.BlockingAudit.audit(t(s, dir, "documents"),
        blockKey = concat_ws(":", col("lang"), expr("n_chars div 50")),
        truthKey = substring(col("text"), 1, 16))
    },

    // Vocabulary building: top-50 tokens by document frequency — the
    // tokenizer-vocab / corpus-stats pass of a training-data pipeline
    // (explode → map-side-combined count → TakeOrderedAndProject; the
    // top-k never sorts the full vocabulary globally).
    Q("q_text_vocab_top50",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_distinct($toksSql)) AS token FROM documents),
         |dfreq AS (SELECT token, count(*) AS doc_freq FROM tok GROUP BY 1)
         |SELECT token, doc_freq FROM dfreq
         |ORDER BY doc_freq DESC, token LIMIT 50""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(array_distinct(TextFunctions.tokens(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("token"))
        .limit(50)
    },

    // Exact dedup on a derived key (the synthetic corpus has no
    // full-text duplicates; 50-char prefixes collide).
    Q("q_dedup_exact_prefix",
      """SELECT md5(substr(text, 1, 50)) AS text_md5,
        |       count(*) AS cluster_size,
        |       cast(min(doc_id) AS bigint) AS keep_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1
        |ORDER BY text_md5""".stripMargin) { (s, dir) =>
      Dedup.exactClusters(
          t(s, dir, "documents").withColumn("prefix", substring(col("text"), 1, 50)),
          idCol = "doc_id", textCol = "prefix")
        .orderBy(col("text_md5"))
    },

    // Fingerprint dedup: md5 over the sorted distinct token set.
    Q("q_dedup_fingerprint",
      s"""SELECT md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint,
         |       count(*) AS cluster_size,
         |       cast(min(doc_id) AS bigint) AS keep_id,
         |       cast(min(length(text)) AS int) AS min_chars,
         |       cast(max(length(text)) AS int) AS max_chars
         |FROM documents GROUP BY 1 HAVING count(*) > 1
         |ORDER BY fingerprint""".stripMargin) { (s, dir) =>
      Dedup.fingerprintClusters(t(s, dir, "documents"))
        .orderBy(col("fingerprint"))
    },

    // Exact n-gram Jaccard near-dup pairs (candidate generation via
    // shared-shingle equi-join with document-frequency skew cap).
    Q("q_dedup_jaccard_pairs",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |capped AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_common,
         |       sa.n_shingles AS n_a, sb.n_shingles AS n_b,
         |       round(cast(n_common AS double) / (sa.n_shingles + sb.n_shingles - n_common), 6)
         |         AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE cast(n_common AS double) / (sa.n_shingles + sb.n_shingles - n_common) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.3)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Containment near-dup: |A∩B| / min(|A|,|B|) catches a small doc
    // embedded in a big one where symmetric Jaccard stays low (union
    // dominated by the big side). Threshold chosen above the Jaccard
    // query's so the two surface genuinely different pairs.
    Q("q_dedup_containment",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |capped AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_common,
         |       sa.n_shingles AS n_a, sb.n_shingles AS n_b,
         |       round(cast(n_common AS double) / least(sa.n_shingles, sb.n_shingles), 6)
         |         AS containment
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE cast(n_common AS double) / least(sa.n_shingles, sb.n_shingles) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), n = 3, threshold = 0.5)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy(col("id_a"), col("id_b"))
    },

    // MinHash+LSH near-dup candidates, md5 hash family: the oracle
    // replays the WHOLE pipeline — Kirsch–Mitzenmacher k=32 signatures
    // from two 60-bit md5 slices ((h1 + i·h2) mod 2^31-1), 8×4 banding,
    // bucket cap, candidate join, signature scoring — in SQL, so the
    // hash check covers banding and estimation, not just counts.
    Q("q_dedup_minhash_lsh",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |hh AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h1,
         |         ('0x' || substr(md5(shingle), 16, 15))::BIGINT % 2147483647 AS h2
         |  FROM sh),
         |hx AS (
         |  SELECT doc_id, s.i AS i, min((h1 + s.i * h2) % 2147483647) AS mh
         |  FROM hh CROSS JOIN (SELECT unnest(range(32)) AS i) s
         |  GROUP BY 1, 2),
         |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM hx GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, sig, b.b AS band,
         |         md5(array_to_string(list_transform(sig[b.b * 4 + 1 : b.b * 4 + 4],
         |               x -> cast(x AS VARCHAR)), ',')) AS bhash
         |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) b),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bhash) AS bsz FROM banded)
         |  WHERE bsz <= 1000),
         |scored AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |         cast(len(list_filter(range(32), i -> a.sig[i + 1] = b.sig[i + 1])) AS double) / 32
         |           AS est_jaccard
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM scored
         |WHERE est_jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"),
          n = 3, bands = 8, rowsPerBand = 4, estThreshold = 0.2, oracleHashes = true)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Incremental dedup: delta batch (doc_id % 5 = 0) probed against the
    // banded signature INDEX of the rest of the corpus (deltaMinHashPairs
    // — the daily-ingest shape where the corpus is hashed once and only
    // new batches are signed). Same md5 Kirsch–Mitzenmacher family as
    // q_dedup_minhash_lsh; the oracle replays signatures, banding, the
    // index-side bucket cap, and the asymmetric probe join. The
    // delta-side cap in the operator is drop-equivalent (capped buckets
    // have no index rows left to pair with), so the oracle needs only
    // the index-side cap.
    Q("q_dedup_delta_index",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |hh AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h1,
         |         ('0x' || substr(md5(shingle), 16, 15))::BIGINT % 2147483647 AS h2
         |  FROM sh),
         |hx AS (
         |  SELECT doc_id, s.i AS i, min((h1 + s.i * h2) % 2147483647) AS mh
         |  FROM hh CROSS JOIN (SELECT unnest(range(32)) AS i) s
         |  GROUP BY 1, 2),
         |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM hx GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, sig, b.b AS band,
         |         md5(array_to_string(list_transform(sig[b.b * 4 + 1 : b.b * 4 + 4],
         |               x -> cast(x AS VARCHAR)), ',')) AS bhash
         |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) b),
         |idx AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bhash) AS bsz
         |    FROM banded WHERE doc_id % 5 <> 0)
         |  WHERE bsz <= 1000),
         |scored AS (
         |  SELECT DISTINCT d.doc_id AS new_id, x.doc_id AS dup_of,
         |         cast(len(list_filter(range(32), i -> d.sig[i + 1] = x.sig[i + 1])) AS double) / 32
         |           AS est_jaccard
         |  FROM (SELECT * FROM banded WHERE doc_id % 5 = 0) d
         |  JOIN idx x ON d.band = x.band AND d.bhash = x.bhash)
         |SELECT new_id, dup_of, est_jaccard FROM scored
         |WHERE est_jaccard >= 0.2 ORDER BY new_id, dup_of""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val indexBanded = Dedup.minHashBanded(docs.filter(col("doc_id") % 5 =!= 0),
        n = 3, bands = 8, rowsPerBand = 4, oracleHashes = true)
      Dedup.deltaMinHashPairs(indexBanded, docs.filter(col("doc_id") % 5 === 0),
          n = 3, bands = 8, rowsPerBand = 4, estThreshold = 0.2, oracleHashes = true)
        .orderBy(col("new_id"), col("dup_of"))
    },

    // SimHash near-dup pairs, md5 60-bit hash family. The oracle is the
    // BRUTE-FORCE all-pairs hamming join — hash equality therefore also
    // proves the pigeonhole block decomposition (maxHamming=3 → 4
    // disjoint 15-bit blocks) generates every pair at the radius, the
    // claim DedupSpec asserts for the xxhash64 production family.
    Q("q_dedup_simhash",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |th AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
         |bits AS (
         |  SELECT doc_id, b.i AS i,
         |         sum(CASE WHEN ((h >> b.i) & 1) = 1 THEN 1 ELSE -1 END) AS s
         |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS i) b
         |  GROUP BY 1, 2),
         |fp AS (
         |  SELECT doc_id,
         |         cast(sum(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END) AS BIGINT) AS fp
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       cast(bit_count(xor(a.fp, b.fp)) AS int) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), maxHamming = 3, oracleHashes = true)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Dedup cluster closure: connected components over the exact-Jaccard
    // near-dup pairs (A≈B, B≈C ⇒ one cluster, keep min id). The Spark
    // side iterates min-label propagation to a fixpoint; the oracle
    // computes the same closure as a recursive transitive-reachability
    // CTE — hash equality proves the iterative algorithm converged to
    // the true components, not an intermediate labeling.
    Q("q_dedup_components",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |capped AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE cast(n_common AS double) / (sa.n_shingles + sb.n_shingles - n_common) >= 0.3),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id)
         |SELECT id AS doc_id, min(comp) AS component
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.3))
        .orderBy(col("doc_id"))
    },

    // X174 canonical selection over the dup components: every doc maps
    // to its cluster's keeper (longest text, ties to smallest id;
    // unclustered docs keep themselves) — the actionable keep/drop set
    // a dedup pass applies. Oracle = the components CTE + argmax.
    Q("q_dedup_canonical",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |capped AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE cast(n_common AS double) / (sa.n_shingles + sb.n_shingles - n_common) >= 0.3),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, min(comp) AS component FROM reach GROUP BY id),
         |w AS (SELECT d.doc_id, cast(d.n_chars AS bigint) AS q, c.component
         |      FROM documents d LEFT JOIN comp c USING (doc_id)),
         |canon AS (SELECT component, doc_id AS canon_id FROM (
         |    SELECT component, doc_id,
         |           row_number() OVER (PARTITION BY component ORDER BY q DESC, doc_id) AS rn
         |    FROM w WHERE component IS NOT NULL) WHERE rn = 1)
         |SELECT w.doc_id, cast(w.component AS bigint) AS component,
         |       cast(coalesce(canon.canon_id, w.doc_id) AS bigint) AS canonical_id,
         |       coalesce(canon.canon_id, w.doc_id) = w.doc_id AS is_canonical
         |FROM w LEFT JOIN canon USING (component)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val components = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3))
      graft.operators.Canonicalize.assign(docs, components, "doc_id", "n_chars")
        .orderBy(col("doc_id"))
    },

    // X175 minhash calibration: sketch estimate vs exact Jaccard per
    // signature-match level over the LSH candidate set — the audit
    // that sizes k for a threshold. Integer match counts, ppm
    // fixed-point exact Jaccard, exact-sum means.
    Q("q_dedup_minhash_error",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |hh AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h1,
         |         ('0x' || substr(md5(shingle), 16, 15))::BIGINT % 2147483647 AS h2
         |  FROM sh),
         |hx AS (
         |  SELECT doc_id, s.i AS i, min((h1 + s.i * h2) % 2147483647) AS mh
         |  FROM hh CROSS JOIN (SELECT unnest(range(32)) AS i) s
         |  GROUP BY 1, 2),
         |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM hx GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, sig, b.b AS band,
         |         md5(array_to_string(list_transform(sig[b.b * 4 + 1 : b.b * 4 + 4],
         |               x -> cast(x AS VARCHAR)), ',')) AS bhash
         |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) b),
         |cappedb AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bhash) AS bsz FROM banded)
         |  WHERE bsz <= 1000),
         |est AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |         cast(len(list_filter(range(32), i -> a.sig[i + 1] = b.sig[i + 1])) AS bigint)
         |           AS match_cnt
         |  FROM cappedb a JOIN cappedb b
         |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
         |cappedsh AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM cappedsh a JOIN cappedsh b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT id_a, id_b,
         |         (n_common * 1000000) // (sa.n_shingles + sb.n_shingles - n_common) AS exact_ppm
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b),
         |joined AS (
         |  SELECT e.match_cnt, (e.match_cnt * 1000000) // 32 AS est_ppm,
         |         coalesce(x.exact_ppm, 0) AS exact_ppm
         |  FROM est e LEFT JOIN exact x USING (id_a, id_b))
         |SELECT match_cnt, cast(count(*) AS bigint) AS n_pairs,
         |       round(cast(sum(est_ppm) AS double) / count(*) / 1000000.0, 6) AS mean_est,
         |       round(cast(sum(exact_ppm) AS double) / count(*) / 1000000.0, 6) AS mean_exact,
         |       round(cast(sum(abs(est_ppm - exact_ppm)) AS double) / count(*) / 1000000.0, 6)
         |         AS mean_abs_err
         |FROM joined GROUP BY match_cnt ORDER BY match_cnt""".stripMargin) { (s, dir) =>
      graft.operators.MinHashCalibration.errorByEstimate(t(s, dir, "documents"),
        n = 3, bands = 8, rowsPerBand = 4, oracleHashes = true)
    },

    // Sequence packing: shard-parallel token-budget bin assignment
    // (CorpusPacking), rolled up per bin. The oracle replays the modulo
    // sharding, per-shard cumulative sum and floor-division binning.
    Q("q_text_pack_bins",
      s"""WITH sized AS (
         |  SELECT doc_id, cast(len($toksSql) AS bigint) AS n_tokens,
         |         doc_id % 8 AS shard
         |  FROM documents),
         |placed AS (
         |  SELECT doc_id, n_tokens, shard,
         |         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
         |  FROM sized)
         |SELECT cast(shard AS bigint) AS shard,
         |       cast(floor(start_tok / 2048) AS bigint) AS bin,
         |       count(*) AS n_docs, cast(sum(n_tokens) AS bigint) AS bin_tokens,
         |       cast(min(doc_id) AS bigint) AS first_doc
         |FROM placed GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin) { (s, dir) =>
      val sized = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
      CorpusPacking.packByTokenBudget(sized, idCol = "doc_id",
          nTokensCol = "n_tok", budgetTokens = 2048L, nShards = 8)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("shard"), col("bin"))
    },

    // TF-IDF top terms per document: explode → tf per (doc, token) →
    // df per token (aggregated from tf, one pass over the exploded set)
    // → score = tf · ln(N/df) → per-doc top-3 via WindowGroupLimit.
    Q("q_text_tfidf_top3",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT doc_id, token,
         |         round(tf * ln(cast(n AS double) / df), 4) AS tfidf
         |  FROM tf JOIN dfreq USING (token) CROSS JOIN nd)
         |SELECT doc_id, token, tfidf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |           ORDER BY tfidf DESC, token) AS rk
         |  FROM scored) WHERE rk <= 3
         |ORDER BY doc_id, tfidf DESC, token""".stripMargin) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, dir, "documents").count().toDouble
      val scored = tf.join(dfreq, "token")
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(lit(nDocs) / col("df")), 4).as("tfidf"))
      TopK.perGroup(scored, partitionBy = Seq(col("doc_id")),
          orderBy = Seq(col("tfidf").desc, col("token")), k = 3)
        .select(col("doc_id"), col("token"), col("tfidf"))
        .orderBy(col("doc_id"), col("tfidf").desc, col("token"))
    },

    // BM25 ranked retrieval (k1=1.2, b=0.75) for a literal query-term
    // set — the mining-relevant-documents shape of a training-data
    // pipeline (complementing dedup and contamination): per-term
    // partials = IDF · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), summed
    // per doc IN TERM ORDER (sorted collect + fold = DuckDB's
    // list_reduce) so the float path replays exactly; avgdl is an exact
    // integer sum divided once (an avg() of doubles would be
    // summation-order-dependent across engines). ln + round(4) follows
    // the green q_text_tfidf_top3 precedent.
    Q("q_text_bm25", {
      val termsSql = "('hash', 'join', 'scan')"
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
         |stats AS (SELECT cast(sum(dl) AS double) / count(*) AS avgdl,
         |                 count(*) AS n FROM dl),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
         |       WHERE token IN $termsSql GROUP BY 1, 2),
         |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |parts AS (
         |  SELECT t.doc_id, t.token,
         |         ln((n - df + 0.5) / (df + 0.5) + 1)
         |           * (t.tf * 2.2)
         |           / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / avgdl)) AS part
         |  FROM tf t JOIN dl d USING (doc_id) JOIN dfreq USING (token)
         |  CROSS JOIN stats),
         |scored AS (
         |  SELECT doc_id,
         |         round(list_reduce(list_prepend(0.0, list(part ORDER BY token)),
         |                           (acc, x) -> acc + x), 4) AS bm25,
         |         cast(count(*) AS int) AS n_terms
         |  FROM parts GROUP BY doc_id)
         |SELECT doc_id, bm25, n_terms, rk FROM (
         |  SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
         |  FROM scored)
         |WHERE rk <= 20 ORDER BY rk""".stripMargin
    }) { (s, dir) =>
      val terms = Seq("hash", "join", "scan")
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
        count(lit(1)).as("n"))
      val tf = tok.filter(col("token").isInCollection(terms))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val parts = tf.join(dl, "doc_id").join(broadcast(dfreq), "token")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("token"),
          (log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
            * (col("tf") * 2.2)
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
            .as("part"))
      val scored = parts
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("token"), col("part")))).as("_tp"),
          count(lit(1)).cast("int").as("n_terms"))
        .select(col("doc_id"),
          round(aggregate(col("_tp.part"), lit(0.0), (acc, x) => acc + x), 4).as("bm25"),
          col("n_terms"))
      // persisted `tok` is released by the harness's per-query cache
      // clear (unpersisting here, before evaluation, would defeat it)
      scored
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("bm25").desc, col("doc_id"))))
        .filter(col("rk") <= 20)
        .orderBy(col("rk"))
    },

    // Multimodal metadata as a pure projection (no decode needed when
    // metadata is already columnar); the decode path proper is
    // q_multimodal_decode below.
    Q("q_multimodal_binary_meta",
      """SELECT doc_id,
        |       cast(strlen(text) AS int) AS n_bytes,
        |       cast(strlen(text) % 640 + 16 AS int) AS fake_width,
        |       cast((strlen(text) * 7) % 480 + 16 AS int) AS fake_height,
        |       substr(sha256(text), 1, 8) AS content_sha8
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bytes = octet_length(col("text"))
      t(s, dir, "documents").select(
          col("doc_id"),
          bytes.as("n_bytes"),
          (bytes % 640 + 16).as("fake_width"),
          ((bytes * 7) % 480 + 16).as("fake_height"),
          substring(sha2(col("text").cast("binary"), 256), 1, 8).as("content_sha8"))
        .orderBy(col("doc_id"))
    },

    // Multimodal decode path: text rendered into a binary GFT1 payload
    // (header + body), then parsed back by the typed mapPartitions
    // decoder in graft.operators.Multimodal — the oracle derives the
    // expected metadata straight from the table, so hash equality proves
    // the encode→binary→decode loop end to end.
    Q("q_multimodal_decode",
      """SELECT doc_id,
        |       cast(octet_length(encode(text)) % 640 + 16 AS int) AS width,
        |       cast((octet_length(encode(text)) * 7) % 480 + 16 AS int) AS height,
        |       cast(octet_length(encode(text)) AS int) AS n_body_bytes,
        |       true AS valid
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bytes = octet_length(col("text"))
      val payloads = t(s, dir, "documents").select(
        col("doc_id"),
        Multimodal.encodePayload(
          bytes % 640 + 16, (bytes * 7) % 480 + 16, col("text")).as("payload"))
      Multimodal.extractMeta(payloads).orderBy(col("doc_id"))
    },

    // Multimodal binary→binary transform (the resize/transcode slot):
    // payloads re-encoded at half dimensions with every-2nd-byte body
    // subsampling, inside one partition pass. The body is the md5 hex of
    // the text (pure ASCII), so the oracle can rebuild the EXPECTED
    // OUTPUT BYTES — header format, scaled dims, subsampled body — and
    // hash equality proves the rewritten binary is byte-identical, not
    // just that metadata looks right.
    Q("q_multimodal_resize",
      """WITH p AS (
        |  SELECT doc_id,
        |         (octet_length(encode(text)) % 640 + 16) // 2 AS w2,
        |         ((octet_length(encode(text)) * 7) % 480 + 16) // 2 AS h2,
        |         array_to_string(list_transform(range(0, 32, 2),
        |           i -> substr(md5(text), i + 1, 1)), '') AS body2
        |  FROM documents)
        |SELECT doc_id, cast(33 AS int) AS n_bytes,
        |       md5('GFT1 ' || lpad(cast(w2 AS varchar), 5, '0') || ' ' ||
        |           lpad(cast(h2 AS varchar), 5, '0') || chr(10) || body2) AS payload_md5,
        |       true AS resized
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bytes = octet_length(col("text"))
      val payloads = t(s, dir, "documents").select(
        col("doc_id"),
        Multimodal.encodePayload(bytes % 640 + 16, (bytes * 7) % 480 + 16,
          md5(col("text").cast("binary"))).as("payload"))
      Multimodal.resizePayload(payloads, factor = 2)
        .select(col("doc_id"),
          octet_length(col("payload")).cast("int").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("resized"))
        .orderBy(col("doc_id"))
    },

    // Temporal frame sampling (the video slot): GFT1 payloads read as
    // 4 frames of 8 bytes, every 2nd frame kept and re-assembled under
    // a rewritten header — the oracle rebuilds the EXPECTED BYTES, so
    // hash equality proves the sampled binary, not just its metadata.
    Q("q_multimodal_framesample",
      """WITH p AS (SELECT doc_id, md5(text) AS b FROM documents)
        |SELECT doc_id, cast(4 AS int) AS n_frames, cast(2 AS int) AS n_kept,
        |       cast(33 AS int) AS n_bytes,
        |       md5('GFT1 00008 00002' || chr(10) ||
        |           substr(b, 1, 8) || substr(b, 17, 8)) AS payload_md5,
        |       true AS sampled
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val payloads = t(s, dir, "documents").select(
        col("doc_id"),
        Multimodal.encodePayload(lit(8), lit(4), md5(col("text").cast("binary"))).as("payload"))
      Multimodal.frameSample(payloads, stride = 2)
        .select(col("doc_id"), col("n_frames"), col("n_kept"),
          octet_length(col("payload")).cast("int").as("n_bytes"),
          md5(col("payload")).as("payload_md5"), col("sampled"))
        .orderBy(col("doc_id"))
    },

    // Tokenizer-vocabulary coverage: OOV rate per language against the
    // corpus's own top-100 token vocabulary (count-desc, token
    // tie-break) — the pre-tokenizer-training sanity gate. Counts stay
    // integers; one ratio at the end.
    Q("q_text_oov",
      """WITH tok AS (SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |             FROM documents),
        |vocab AS (SELECT w FROM (
        |    SELECT w, count(*) AS c FROM tok GROUP BY 1
        |    ORDER BY c DESC, w LIMIT 100)),
        |m AS (SELECT lang, count(*) AS n_tok,
        |             sum(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END) AS n_oov
        |      FROM tok GROUP BY 1)
        |SELECT lang, cast(n_tok AS bigint) AS n_tok, cast(n_oov AS bigint) AS n_oov,
        |       round(n_oov::DOUBLE / n_tok::DOUBLE, 6) AS oov_rate
        |FROM m ORDER BY lang""".stripMargin) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("w"))
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(100)
        .select(col("w"), lit(true).as("_in"))
      tok.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tok").cast("double"), 6))
        .orderBy(col("lang"))
    },

    // Repetition-based quality signals (Gopher-style): duplicated-bigram
    // fraction (pure array expression) + most-frequent-token fraction
    // (explode → two map-side-combined aggs). The `repetitive` flag is
    // derived from the ROUNDED fractions on both sides so the boolean can
    // never disagree through float noise.
    Q("q_text_repetition",
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bstat AS (
         |  SELECT doc_id, cast(len(bgs) AS int) AS n_bigrams,
         |         round(CASE WHEN len(bgs) = 0 THEN 0.0
         |               ELSE 1.0 - cast(len(list_distinct(bgs)) AS double) / len(bgs) END, 4)
         |           AS dup_bigram_frac
         |  FROM (SELECT doc_id,
         |          CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
         |               ELSE list_transform(range(len(toks) - 1),
         |                      i -> array_to_string(toks[i + 1 : i + 2], ' ')) END AS bgs
         |        FROM tk)),
         |tstat AS (
         |  SELECT doc_id, cast(sum(n) AS int) AS n_tokens,
         |         round(cast(max(n) AS double) / sum(n), 4) AS top_token_frac
         |  FROM (SELECT doc_id, tok, count(*) AS n
         |        FROM (SELECT doc_id, unnest(toks) AS tok FROM tk) GROUP BY 1, 2)
         |  GROUP BY doc_id)
         |SELECT b.doc_id, n_bigrams, dup_bigram_frac, n_tokens, top_token_frac,
         |       (dup_bigram_frac > 0.2 OR top_token_frac > 0.2) AS repetitive
         |FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
         |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      RepetitionScore.score(t(s, dir, "documents"))
        .select(col("doc_id"),
          col("n_bigrams").cast("int").as("n_bigrams"),
          round(col("dup_bigram_frac"), 4).as("dup_bigram_frac"),
          col("n_tokens").cast("int").as("n_tokens"),
          round(col("top_token_frac"), 4).as("top_token_frac"))
        .withColumn("repetitive",
          col("dup_bigram_frac") > 0.2 || col("top_token_frac") > 0.2)
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination: distinct 3-gram overlap of each corpus
    // doc (doc_id % 13 ≠ 0) against the "benchmark" slice (doc_id % 13 =
    // 0). The benchmark shingle set is broadcast — the corpus-side
    // explode never shuffles, which is the whole design at 100 TB (eval
    // suites are MBs, the corpus is TBs).
    Q("q_text_contamination",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0),
         |corp AS (SELECT * FROM sh WHERE doc_id % 13 <> 0)
         |SELECT c.doc_id, cast(count(*) AS int) AS n_shingles,
         |       cast(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS int)
         |         AS n_contaminated,
         |       round(cast(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS double)
         |             / count(*), 4) AS contamination
         |FROM corp c LEFT JOIN bench b ON c.shingle = b.shingle
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Contamination.ngramOverlap(
          docs.filter(pmod(col("doc_id"), lit(13)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(13)) === 0), n = 3)
        .select(col("doc_id"),
          col("n_shingles").cast("int").as("n_shingles"),
          col("n_contaminated").cast("int").as("n_contaminated"),
          round(col("contamination"), 4).as("contamination"))
        .orderBy(col("doc_id"))
    },

    // PII scrubbing: the corpus is augmented with a deterministic email +
    // long account number per doc (the synthetic texts contain no PII),
    // then masked; the oracle replays augmentation, both regexp passes
    // (RE2-compatible patterns, 'g' flag — DuckDB replaces only the first
    // match by default), and the md5 of the scrubbed text.
    Q("q_text_scrub",
      s"""WITH aug AS (
         |  SELECT doc_id,
         |         text || ' contact user' || cast(doc_id AS VARCHAR)
         |              || '@mail.example.com ref ' || cast(doc_id * 1234567 + 100000 AS VARCHAR)
         |           AS aug
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         regexp_replace(aug, '${TextFunctions.emailRe}', '<EMAIL>', 'g') AS m1,
         |         cast(len(regexp_extract_all(aug, '${TextFunctions.emailRe}')) AS int)
         |           AS n_emails
         |  FROM aug)
         |SELECT doc_id, n_emails,
         |       cast(len(regexp_extract_all(m1, '${TextFunctions.longDigitsRe}')) AS int)
         |         AS n_longnums,
         |       md5(regexp_replace(m1, '${TextFunctions.longDigitsRe}', '<NUM>', 'g'))
         |         AS scrub_md5
         |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val aug = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com ref "), (col("doc_id") * 1234567 + 100000).cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), aug.as("_aug"))
        .select(col("doc_id"),
          regexp_replace(col("_aug"), TextFunctions.emailRe, "<EMAIL>").as("_m1"),
          TextFunctions.matchCount(col("_aug"), TextFunctions.emailRe).as("n_emails"))
        .select(col("doc_id"), col("n_emails"),
          TextFunctions.matchCount(col("_m1"), TextFunctions.longDigitsRe).as("n_longnums"),
          md5(regexp_replace(col("_m1"), TextFunctions.longDigitsRe, "<NUM>")
            .cast("binary")).as("scrub_md5"))
        .orderBy(col("doc_id"))
    },

    // Temperature-weighted mixture sampling over the (skewed) lang
    // column: rate_s = sqrt(c_min/c_s) (alpha = 0.5 → sqrt, which IEEE
    // 754 rounds correctly in every engine), row selection by the
    // replayable multiplicative hash — the oracle re-derives the rates
    // AND the exact kept set.
    Q("q_sample_mixture_temp",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |r AS (SELECT lang, n,
        |        sqrt(cast((SELECT min(n) FROM c) AS double) / cast(n AS double)) AS rate
        |      FROM c),
        |kept AS (
        |  SELECT d.lang, count(*) AS n_kept
        |  FROM documents d JOIN r ON d.lang = r.lang
        |  WHERE ((((d.doc_id + 42) % 1000000007) * 2654435761) % 1000000007)
        |          / 1000000007.0 < r.rate
        |  GROUP BY d.lang)
        |SELECT r.lang, cast(r.n AS int) AS n_docs, round(r.rate, 6) AS rate,
        |       cast(coalesce(k.n_kept, 0) AS int) AS n_kept
        |FROM r LEFT JOIN kept k ON r.lang = k.lang
        |ORDER BY r.lang""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val kept = MixtureSampler.temperatureSample(docs, "lang", "doc_id")
        .groupBy(col("lang")).agg(count(lit(1)).as("_k"))
      MixtureSampler.rates(docs, "lang")
        .join(kept, Seq("lang"), "left_outer")
        .select(col("lang"), col("n_docs").cast("int").as("n_docs"),
          round(col("_rate"), 6).as("rate"),
          coalesce(col("_k"), lit(0L)).cast("int").as("n_kept"))
        .orderBy(col("lang"))
    },

    // Token-budget chunking (16-token chunks, 4-token overlap): the
    // oracle replays chunk counting (⌈(n−overlap)/stride⌉, min 1), the
    // per-chunk token slices, and the md5 of every chunk's text — so hash
    // equality proves boundary/tail behavior, not just row counts. The
    // Spark plan is scan → project → generate: zero exchanges.
    Q("q_text_chunks",
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ck AS (
         |  SELECT doc_id, len(toks) AS n,
         |         greatest(1, cast(ceil(cast(len(toks) - 4 AS double) / 12) AS int))
         |           AS n_chunks, toks
         |  FROM tk),
         |ex AS (
         |  SELECT doc_id, i.i AS chunk_ix, toks[i.i * 12 + 1 : i.i * 12 + 16] AS chunk
         |  FROM ck CROSS JOIN LATERAL (SELECT unnest(range(n_chunks)) AS i) i)
         |SELECT doc_id, cast(chunk_ix AS int) AS chunk_ix,
         |       cast(len(chunk) AS int) AS n_chunk_tokens,
         |       md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM ex ORDER BY doc_id, chunk_ix""".stripMargin) { (s, dir) =>
      Chunking.tokenChunks(t(s, dir, "documents"), budget = 16, overlap = 4)
        .orderBy(col("doc_id"), col("chunk_ix"))
    },

    // Deterministic k-per-stratum "reservoir": the 10 smallest hash
    // scores per lang. Plans a WindowGroupLimit (map-side k-per-group
    // before the exchange); the oracle replays the integer hash order
    // exactly, so the sampled IDs — not just counts — hash-match.
    Q("q_sample_group_topk",
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY ((((doc_id + 42) % 1000000007) * 2654435761) % 1000000007)
        |                      / 1000000007.0, doc_id) AS rk
        |  FROM documents) WHERE rk <= 10
        |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      StratifiedSampler.samplePerStratum(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          strataCol = "lang", k = 10, idCol = "doc_id")
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // Source-mixture planning: per-source keep rates realizing the
    // largest corpus that matches a target mixture exactly (the binding
    // source is the one with the smallest availability-to-target ratio;
    // everything else downsamples relative to it). Weights derive
    // deterministically from the source name so both engines build the
    // same target.
    Q("q_sample_mix_plan",
      """WITH c AS (SELECT source, cast(count(*) AS bigint) AS n_avail
        |           FROM documents GROUP BY 1),
        |t AS (SELECT source, cast(substr(source, 4)::INT % 5 + 1 AS DOUBLE) AS w
        |      FROM (SELECT DISTINCT source FROM documents)),
        |tw AS (SELECT sum(w) AS ws FROM t),
        |j AS (SELECT c.source, c.n_avail, t.w / tw.ws AS share
        |      FROM c JOIN t USING (source), tw),
        |sc AS (SELECT min(n_avail / share) AS scale FROM j WHERE share > 0)
        |SELECT source, n_avail, round(share, 6) AS target_share,
        |       round(least(1.0, sc.scale * share / n_avail), 6) AS keep_rate,
        |       cast(floor(n_avail * round(least(1.0, sc.scale * share / n_avail), 6)) AS bigint)
        |         AS n_keep
        |FROM j, sc ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val target = docs.select(col("source")).distinct()
        .withColumn("weight",
          (substring(col("source"), 4, 10).cast("int") % 5 + 1).cast("double"))
      graft.operators.MixturePlanner.plan(docs, target)
    },

    // Cross-source quality calibration: percent_rank of n_chars WITHIN
    // each source — rank-normalized scores are comparable across
    // heterogeneous sources before blending (raw score scales are
    // not). Unique (score, id) ordering keeps ranks tie-free; each
    // window sorts one source partition, never the corpus.
    Q("q_quality_rank_normalize",
      """SELECT doc_id, source, n_chars,
        |       round(percent_rank() OVER (PARTITION BY source
        |                                  ORDER BY n_chars, doc_id), 6) AS pr
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").asc, col("doc_id").asc)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy(col("doc_id"))
    },

    // Curriculum interleaving: quality-quantile buckets (exact
    // percentile cutoffs folded in as literals — never a global ntile)
    // alternate via the arithmetic key (pos−1)·4 + bucket, a total
    // training order with NO global sort. n_chars stands in for the
    // quality score; integer scores make the cutoff comparisons exact
    // on both engines.
    Q("q_sample_curriculum",
      """WITH cuts AS (SELECT quantile_cont(cast(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS c
        |              FROM documents),
        |b AS (SELECT doc_id,
        |             cast(n_chars AS DOUBLE) AS score,
        |             1 + (CASE WHEN cast(n_chars AS DOUBLE) > c[1] THEN 0 ELSE 1 END)
        |               + (CASE WHEN cast(n_chars AS DOUBLE) > c[2] THEN 0 ELSE 1 END)
        |               + (CASE WHEN cast(n_chars AS DOUBLE) > c[3] THEN 0 ELSE 1 END) AS bucket
        |      FROM documents, cuts),
        |p AS (SELECT doc_id, bucket,
        |             cast(row_number() OVER (PARTITION BY bucket
        |                                     ORDER BY score DESC, doc_id) AS bigint) AS pos
        |      FROM b)
        |SELECT doc_id, cast(bucket AS int) AS bucket, pos,
        |       (pos - 1) * 4 + bucket AS ikey
        |FROM p ORDER BY ikey, doc_id""".stripMargin) { (s, dir) =>
      graft.operators.CurriculumOrder.interleave(
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("double").as("score")),
        nBuckets = 4)
    },

    // Exact-substring duplication wash (RefinedWeb recipe): word
    // 8-grams shared by >= 2 docs, each doc scored by the fraction of
    // its gram positions on shared grams — catches the copied paragraph
    // inside an otherwise unique page that whole-document MinHash
    // misses. O(total tokens), never O(docs^2).
    Q("q_text_dupgrams",
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ts
        |             FROM documents),
        |g AS (SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS gram
        |      FROM tok, unnest(generate_series(1, len(ts) - 7)) AS t(i)
        |      WHERE len(ts) >= 8),
        |common AS (SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
        |  WHERE nd >= 2),
        |total AS (SELECT doc_id, cast(count(*) AS bigint) AS n_grams FROM g GROUP BY 1),
        |dup AS (SELECT doc_id, cast(count(*) AS bigint) AS n_dup
        |        FROM g WHERE gram IN (SELECT gram FROM common) GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(t.n_grams, 0) AS n_grams,
        |       coalesce(u.n_dup, 0) AS n_dup,
        |       CASE WHEN coalesce(t.n_grams, 0) > 0
        |            THEN round(coalesce(u.n_dup, 0)::DOUBLE / t.n_grams::DOUBLE, 6)
        |            ELSE 0.0 END AS dup_frac
        |FROM documents d LEFT JOIN total t USING (doc_id) LEFT JOIN dup u USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.DupNgrams.washFraction(t(s, dir, "documents"), n = 8, minDocs = 2L)
    },

    // X183 winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS):
    // rightmost minimal 5-gram hash per 8-window — guaranteed detection
    // of any >= 12-token match at ~2/9 index density. ONE bounded
    // window per doc, no corpus window, no join; the md5 gram-hash
    // family and the (h, -pos) struct-min tie rule replay exactly in
    // DuckDB. Per-doc digest: count + min/max + modular checksum of the
    // selected hash set.
    Q("q_text_winnow_fp",
      s"""WITH tok AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |g AS (SELECT doc_id, cast(i - 1 AS int) AS pos,
         |             array_to_string(ts[i:i+4], ' ') AS gram
         |      FROM tok, unnest(generate_series(1, len(ts) - 4)) AS u(i)
         |      WHERE len(ts) >= 5),
         |h AS (SELECT doc_id, pos,
         |             ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h FROM g),
         |sel AS (SELECT doc_id, pos,
         |               min({'h': h, 'np': -pos}) OVER (
         |                 PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS s
         |        FROM h),
         |fp AS (SELECT DISTINCT doc_id, s.h AS h FROM sel WHERE pos >= 7)
         |SELECT d.doc_id,
         |       cast(coalesce(f.n_fp, 0) AS bigint) AS n_fp,
         |       f.h_min, f.h_max,
         |       cast(coalesce(f.h_sum_mod, 0) AS bigint) AS h_sum_mod
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id, count(*) AS n_fp, min(h) AS h_min, max(h) AS h_max,
         |         sum(h % 1000003) AS h_sum_mod
         |  FROM fp GROUP BY 1) f USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val fp = graft.operators.Winnowing.fingerprints(
          t(s, dir, "documents"), "doc_id", "text", k = 5, w = 8)
        .select(col("id").as("doc_id"), col("h")).distinct()
      val agg = fp.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_fp"), min(col("h")).as("h_min"), max(col("h")).as("h_max"),
        sum(col("h") % 1000003).as("h_sum_mod"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_fp", "h_sum_mod"))
        .orderBy(col("doc_id"))
    },

    // X183 winnowing copy candidates: doc pairs sharing >= 2 selected
    // fingerprints — the MOSS index join (cost per shared hash bucket,
    // LSH-band shape), catching the >= 12-token copied span the
    // whole-doc signatures dilute away.
    Q("q_dedup_winnow_pairs",
      s"""WITH tok AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |g AS (SELECT doc_id, cast(i - 1 AS int) AS pos,
         |             array_to_string(ts[i:i+4], ' ') AS gram
         |      FROM tok, unnest(generate_series(1, len(ts) - 4)) AS u(i)
         |      WHERE len(ts) >= 5),
         |h AS (SELECT doc_id, pos,
         |             ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h FROM g),
         |sel AS (SELECT doc_id, pos,
         |               min({'h': h, 'np': -pos}) OVER (
         |                 PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS s
         |        FROM h),
         |fp AS (SELECT DISTINCT doc_id, s.h AS h FROM sel WHERE pos >= 7)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       cast(count(*) AS bigint) AS n_shared
         |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.operators.Winnowing.candidatePairs(
          t(s, dir, "documents"), "doc_id", "text", k = 5, w = 8, minShared = 2)
        .select(col("id_a"), col("id_b"), col("n_shared"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // End-to-end corpus pipeline — the LLM-data-side counterpart of
    // AccidentPipeline, composed from the engine's own stages: exact
    // dedup (keep min id per md5) → quality gate (length + punctuation)
    // → temperature mixture sampling by lang → token-budget chunking →
    // per-lang rollup. The oracle replays EVERY stage, so hash equality
    // proves the stages compose (each is also individually gated by its
    // own query above). Chunks overlap, so sum_chunk_tokens
    // deliberately exceeds raw token counts.
    Q("q_pipeline_corpus",
      s"""WITH dedup AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang,
         |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |qual AS (
         |  SELECT doc_id, text, lang FROM dedup
         |  WHERE len($toksSql) BETWEEN 10 AND 10000
         |    AND (CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE cast(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS double)
         |              / cast(length(text) AS double) END) <= 0.2),
         |c AS (SELECT lang, count(*) AS n FROM qual GROUP BY lang),
         |r AS (SELECT lang, n,
         |        sqrt(cast((SELECT min(n) FROM c) AS double) / cast(n AS double)) AS rate
         |      FROM c),
         |kept AS (
         |  SELECT q.doc_id, q.text, q.lang FROM qual q JOIN r ON q.lang = r.lang
         |  WHERE ((((q.doc_id + 42) % 1000000007) * 2654435761) % 1000000007)
         |          / 1000000007.0 < r.rate),
         |tk AS (SELECT doc_id, lang, $toksSql AS toks FROM kept),
         |ck AS (
         |  SELECT doc_id, lang,
         |         greatest(1, cast(ceil(cast(len(toks) - 4 AS double) / 12) AS int))
         |           AS n_chunks, toks
         |  FROM tk),
         |ex AS (
         |  SELECT doc_id, lang, len(toks[i.i * 12 + 1 : i.i * 12 + 16]) AS n_ct
         |  FROM ck CROSS JOIN LATERAL (SELECT unnest(range(n_chunks)) AS i) i)
         |SELECT lang, cast(count(DISTINCT doc_id) AS int) AS n_docs,
         |       cast(count(*) AS int) AS n_chunks,
         |       cast(sum(n_ct) AS int) AS sum_chunk_tokens
         |FROM ex GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val deduped = Dedup.dropExactDuplicates(t(s, dir, "documents"))
        .select(col("doc_id"), col("text"), col("lang"))
      // persist: the filtered corpus feeds BOTH the mixture-rate counts
      // and the sampling filter — unpersisted, the md5-dedup window +
      // quality gates re-run per consumer (2 extra full scans at scale)
      val quality = deduped.filter(
          TextFunctions.tokenCount(col("text")).between(10, 10000) &&
            TextFunctions.punctRatio(col("text")) <= 0.2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sampled = MixtureSampler.temperatureSample(quality, "lang", "doc_id")
      // lang rides the chunk rows (carryCols): a join back to `sampled`
      // would evaluate the dedup→quality→sample subtree twice
      Chunking.tokenChunks(sampled, budget = 16, overlap = 4, carryCols = Seq("lang"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).cast("int").as("n_docs"),
          count(lit(1)).cast("int").as("n_chunks"),
          sum(col("n_chunk_tokens")).cast("int").as("sum_chunk_tokens"))
        .orderBy(col("lang"))
    },

    // Recall visibility for the approximate dedup paths (the round-1
    // "rows-only is not a correctness signal" finding): MinHash-LSH
    // candidates vs the exact n-gram-Jaccard pairs ON THE SAME corpus —
    // one row, computed in-engine (xxhash64 signatures are not DuckDB-
    // expressible; the bound is also asserted in DedupSpec).
    Q.rowsOnly("q_dedup_minhash_recall") { (s, dir) =>
      // deterministic 1/5 subset: the exact-Jaccard side is quadratic in
      // candidate density, and a sampled recall estimate is the standard
      // way to monitor an approximate method at scale (was 1/3; shrunk
      // once DedupSpec also asserted the bound at sf0.001 — the bench
      // query is a monitor, not the proof)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(pmod(col("doc_id"), lit(5)) === 0)
      val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val approx = Dedup.minHashLshPairs(docs, n = 3, bands = 8, rowsPerBand = 4,
          estThreshold = 0.2)
        .select(col("id_a"), col("id_b"), lit(1L).as("_hit"))
      // single evaluation of each side: outer-join indicator + one agg
      exact.join(approx, Seq("id_a", "id_b"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_recalled"))
        .withColumn("recall",
          when(col("n_exact") === 0, lit(1.0))
            .otherwise(round(col("n_recalled") / col("n_exact"), 4)))
    },

    // Bigram-LM perplexity filter (CCNet-style): score every document by
    // its average bigram log-likelihood under the corpus's own add-α
    // bigram model. Float sums fold over (w1, w2)-sorted lists on both
    // engines, so the doubles replay bit-for-bit.
    Q("q_text_lm_score",
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT doc_id, z[1] AS w1, z[2] AS w2
         |       FROM (SELECT doc_id,
         |               unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
         |             FROM tk WHERE len(toks) >= 2)),
         |c2 AS (SELECT w1, w2, cast(count(*) AS bigint) AS c2 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, cast(sum(c2) AS bigint) AS c1 FROM c2 GROUP BY 1),
         |v AS (SELECT cast(count(DISTINCT token) AS bigint) AS vsz
         |      FROM (SELECT unnest(toks) AS token FROM tk)),
         |parts AS (
         |  SELECT b.doc_id, b.w1, b.w2,
         |         ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * vsz)) AS part
         |  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
         |SELECT doc_id, cast(count(*) AS int) AS n_bigrams,
         |       round(list_reduce(list_prepend(0.0, list(part ORDER BY w1, w2)),
         |                         (acc, x) -> acc + x) / count(*), 4) AS avg_ll
         |FROM parts GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      NgramLanguageModel.scoreDocs(t(s, dir, "documents"), alpha = 0.5)
        .orderBy(col("doc_id"))
    },

    // Per-document lexical profile: OOV rate vs the corpus top-20
    // vocabulary, token entropy, type-token ratio — the statistical
    // quality signals complementing the rule gates of q_text_quality.
    Q("q_text_lexical_profile",
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM tk),
         |tf AS (SELECT doc_id, token, cast(count(*) AS bigint) AS tf FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, cast(sum(tf) AS bigint) AS dl,
         |              cast(count(*) AS bigint) AS n_types FROM tf GROUP BY 1),
         |vocab AS (
         |  SELECT token FROM (
         |    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rk
         |    FROM tok GROUP BY token) WHERE rk <= 20),
         |oov AS (SELECT t.doc_id,
         |               cast(sum(CASE WHEN v.token IS NULL THEN t.tf ELSE 0 END) AS bigint)
         |                 AS oov_occ
         |        FROM tf t LEFT JOIN vocab v USING (token) GROUP BY 1),
         |ent AS (
         |  SELECT t.doc_id,
         |         round(list_reduce(list_prepend(0.0,
         |             list(-(cast(t.tf AS double) / cast(d.dl AS double))
         |                   * ln(cast(t.tf AS double) / cast(d.dl AS double)) ORDER BY t.token)),
         |           (acc, x) -> acc + x), 4) AS entropy
         |  FROM tf t JOIN dl d USING (doc_id) GROUP BY t.doc_id)
         |SELECT d.doc_id, cast(d.dl AS int) AS dl, cast(d.n_types AS int) AS n_types,
         |       round(cast(d.n_types AS double) / cast(d.dl AS double), 4) AS ttr,
         |       round(cast(o.oov_occ AS double) / cast(d.dl AS double), 4) AS oov_rate,
         |       e.entropy
         |FROM dl d JOIN oov o USING (doc_id) JOIN ent e USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      LexicalStats.profile(t(s, dir, "documents"), vocabSize = 20)
        .orderBy(col("doc_id"))
    },

    // Per-source mixture-drift monitor: unigram KL(source ‖ corpus).
    Q("q_source_kl_drift",
      s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |tok AS (SELECT source, unnest(toks) AS token FROM tk),
         |sf AS (SELECT source, token, cast(count(*) AS bigint) AS sc FROM tok GROUP BY 1, 2),
         |st AS (SELECT source, cast(sum(sc) AS bigint) AS stot FROM sf GROUP BY 1),
         |cf AS (SELECT token, cast(sum(sc) AS bigint) AS cc FROM sf GROUP BY 1),
         |ct AS (SELECT cast(sum(cc) AS bigint) AS ctot FROM cf),
         |parts AS (
         |  SELECT s.source, s.token, t.stot,
         |         (cast(s.sc AS double) / cast(t.stot AS double))
         |           * ln((cast(s.sc AS double) / cast(t.stot AS double))
         |                / (cast(c.cc AS double) / cast(x.ctot AS double))) AS part
         |  FROM sf s JOIN st t USING (source) JOIN cf c USING (token) CROSS JOIN ct x)
         |SELECT source, cast(max(stot) AS int) AS n_tokens,
         |       round(list_reduce(list_prepend(0.0, list(part ORDER BY token)),
         |                         (acc, x) -> acc + x), 4) AS kl
         |FROM parts GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      LexicalStats.sourceDrift(t(s, dir, "documents"))
        .orderBy(col("source"))
    },

    // Sparse TF-IDF cosine similarity join over trigram terms — pairs
    // only through shared (df-capped) terms, never all-pairs.
    Q("q_text_cosine_pairs",
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, concat_ws(' ', z[1], z[2], z[3]) AS term
         |       FROM (SELECT doc_id,
         |               unnest(list_zip(toks[1:len(toks)-2], toks[2:len(toks)-1],
         |                               toks[3:len(toks)])) AS z
         |             FROM tk WHERE len(toks) >= 3)),
         |tf AS (SELECT doc_id, term, cast(count(*) AS bigint) AS tf FROM sh GROUP BY 1, 2),
         |dfreq AS (SELECT term, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT cast(count(*) AS bigint) AS n FROM documents),
         |w AS (SELECT doc_id, term,
         |             cast(floor(tf * ln(cast(n AS double) / df) * 65536) AS bigint) AS wq
         |      FROM tf JOIN dfreq USING (term) CROSS JOIN nd WHERE df <= 100),
         |nrm AS (SELECT doc_id, cast(sum(wq * wq) AS bigint) AS nrm2
         |        FROM w GROUP BY doc_id),
         |dots AS (
         |  SELECT id_a, id_b, cast(count(*) AS int) AS n_common,
         |         cast(sum(part) AS bigint) AS dot
         |  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.wq * b.wq AS part
         |        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id)
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_common, round(cos, 4) AS cos FROM (
         |  SELECT d.id_a, d.id_b, d.n_common,
         |         cast(d.dot AS double)
         |           / (sqrt(cast(na.nrm2 AS double)) * sqrt(cast(nb.nrm2 AS double))) AS cos
         |  FROM dots d JOIN nrm na ON d.id_a = na.doc_id JOIN nrm nb ON d.id_b = nb.doc_id)
         |WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      SparseSimilarity.cosinePairs(t(s, dir, "documents"),
          n = 3, threshold = 0.3, maxTermDf = 100)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Multimodal near-dup: 60-bit block-mean perceptual hash over GFT1
    // payloads, paired within hamming<=3 via pigeonhole blocking. The
    // fixture builds, for every 5th doc, a "re-encoded variant" payload
    // whose block pattern differs in exactly 2 (or 3, every 10th doc)
    // buckets — the oracle replays byte construction, decode, the exact
    // integer block-mean threshold, and the pairing, so hash equality
    // proves the whole media-dedup path at the requested radius.
    Q("q_multimodal_phash_neardup", {
      // md5 parity: Knuth-multiplicative parities are Beatty-sequence
      // structured (thousands of accidental hamming<=3 collisions);
      // md5 gives genuinely independent per-(doc, bucket) pattern bits
      val bit = "('0x' || substr(md5(d || '_' || k), 1, 15))::BIGINT % 2"
      s"""WITH src AS (
         |  SELECT doc_id * 2 AS pid, doc_id AS d, 0 AS var FROM documents
         |  UNION ALL
         |  SELECT doc_id * 2 + 1 AS pid, doc_id AS d, 1 AS var FROM documents
         |  WHERE doc_id % 5 = 0),
         |bytes AS (
         |  SELECT pid, i.i AS i, 120 + (d % 7) * 13 AS n,
         |         (CASE WHEN (CASE WHEN var = 1 AND (
         |                k = d % 60 OR k = (d * 7 + 13) % 60
         |                OR (d % 10 = 0 AND k = (d * 13 + 29) % 60))
         |              THEN 1 - ($bit) ELSE $bit END) = 1
         |          THEN 200 ELSE 50 END)
         |           + (CASE WHEN i.i % 17 = 3 THEN 1 ELSE 0 END) AS v
         |  FROM (SELECT pid, d, var, 120 + (d % 7) * 13 AS n FROM src) s
         |  CROSS JOIN LATERAL (SELECT unnest(range(n)) AS i) i
         |  CROSS JOIN LATERAL (SELECT (i.i * 60) // n AS k) kk),
         |buckets AS (
         |  SELECT pid, (i * 60) // n AS k, cast(sum(v) AS bigint) AS s,
         |         cast(count(*) AS bigint) AS c, max(n) AS n
         |  FROM bytes GROUP BY 1, 2),
         |tot AS (SELECT pid, cast(sum(s) AS bigint) AS total, max(n) AS n
         |        FROM buckets GROUP BY 1),
         |fp AS (
         |  SELECT b.pid,
         |         cast(sum(CASE WHEN b.s * t.n > t.total * b.c THEN 1::BIGINT << b.k
         |                       ELSE 0::BIGINT END) AS bigint) AS phash
         |  FROM buckets b JOIN tot t USING (pid) GROUP BY 1)
         |SELECT a.pid AS id_a, b.pid AS id_b,
         |       cast(bit_count(xor(a.phash, b.phash)) AS int) AS hamming
         |FROM fp a JOIN fp b ON a.pid < b.pid
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, dir) =>
      // fan out (guide §2.5): the synthetic payload construction below
      // (n md5-driven bytes per row) is this query's dominant map work
      val docs = ScanFanout.byKey(t(s, dir, "documents"), col("doc_id"))
        .select(col("doc_id"))
      val src = docs.select((col("doc_id") * 2).as("pid"), col("doc_id").as("d"), lit(0).as("var"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") * 2 + 1).as("pid"), col("doc_id").as("d"), lit(1).as("var")))
      val n = lit(120) + (col("d") % 7) * 13
      // body hex: per position i, bucket k=(i*60)/n; base pattern bit is
      // hash(d, k); variants flip 2-3 designated buckets; +1 jitter at
      // i%17==3 keeps bytes non-uniform. 200/50 blocks sit far from the
      // global mean, so the phash recovers exactly the pattern bits.
      val hexBody = array_join(transform(sequence(lit(0), n - 1), { i =>
        val k = floor(i * 60 / n).cast("long")
        val base = conv(substring(md5(concat_ws("_", col("d"), k).cast("binary")), 1, 15),
          16, 10).cast("long") % 2
        val flipped = col("var") === 1 && (
          k === col("d") % 60 || k === (col("d") * 7 + 13) % 60 ||
            (col("d") % 10 === 0 && k === (col("d") * 13 + 29) % 60))
        val eff = when(flipped, lit(1) - base).otherwise(base)
        val jit = i % 17 === 3
        when(eff === 1, when(jit, lit("C9")).otherwise(lit("C8")))
          .otherwise(when(jit, lit("33")).otherwise(lit("32")))
      }), "")
      val payloads = src.select(col("pid"),
        Multimodal.encodePayload(n, lit(1), unhex(hexBody)).as("payload"))
      Dedup.hammingPairs(
          Multimodal.perceptualHash(payloads, idCol = "pid").select(col("doc_id"), col("phash")),
          nBits = 60, maxHamming = 3, fpCol = "phash")
        .orderBy(col("id_a"), col("id_b"))
    },

    // Leakage-safe train/test split: assignment hashes the NEAR-DUP
    // GROUP (connected component; singletons = own doc), so duplicate
    // clusters never straddle the split. Oracle replays components
    // (recursive CTE, as q_dedup_components) + the Knuth mod-1e9+7 hash.
    Q("q_ml_group_split",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len($toksSql) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(range(len($toksSql) - 2),
         |                i -> array_to_string($toksSql[i + 1 : i + 3], ' ')) END)) AS shingle
         |  FROM documents),
         |capped AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE cast(n_common AS double) / (sa.n_shingles + sb.n_shingles - n_common) >= 0.3),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM prs
         |  UNION SELECT id_b AS src, id_a AS dst FROM prs),
         |reach(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |comps AS (SELECT id AS doc_id, min(comp) AS component FROM reach GROUP BY id),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS grp,
         |         CASE WHEN (((coalesce(c.component, d.doc_id) + 42) % 1000000007)
         |                      * 2654435761) % 1000000007 < 100000000
         |              THEN 'test' ELSE 'train' END AS split
         |  FROM documents d LEFT JOIN comps c USING (doc_id))
         |SELECT split, cast(count(*) AS int) AS n_docs,
         |       cast(count(DISTINCT grp) AS int) AS n_groups
         |FROM lab GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      Dedup.leakageSafeSplit(t(s, dir, "documents"),
          Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.3),
          testFrac = 0.1)
        .groupBy(col("split"))
        .agg(count(lit(1)).cast("int").as("n_docs"),
          countDistinct(col("grp")).cast("int").as("n_groups"))
        .orderBy(col("split"))
    },

    // BPE tokenizer-fit inner step: most frequent adjacent character
    // pairs inside words — each merge iteration of a BPE trainer is
    // exactly this count (tiny key domain, map-side combined).
    Q("q_text_bpe_merges",
      s"""WITH w AS (SELECT unnest($toksSql) AS w FROM documents),
         |pr AS (SELECT unnest(list_transform(range(length(w) - 1), i -> substr(w, i + 1, 2)))
         |         AS pair
         |       FROM w WHERE length(w) >= 2),
         |cnt AS (SELECT pair, cast(count(*) AS bigint) AS cnt FROM pr GROUP BY 1)
         |SELECT cast(rk AS int) AS rk, pair, cnt FROM (
         |  SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rk FROM cnt)
         |WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, dir) =>
      BpeMerges.topMerges(t(s, dir, "documents"), k = 20).orderBy(col("rk"))
    },

    // PMI collocations: adjacent-pair association scores with every
    // factor inside the ln an exact integer count — the scores
    // themselves hash-compare, not just the ranking.
    Q("q_text_collocations",
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT z[1] AS w1, z[2] AS w2
         |       FROM (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
         |             FROM tk WHERE len(toks) >= 2)),
         |pairs AS (SELECT w1, w2, cast(count(*) AS bigint) AS c_ab
         |          FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
         |uni AS (SELECT w, cast(count(*) AS bigint) AS c
         |        FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
         |nu AS (SELECT cast(sum(c) AS bigint) AS n_uni FROM uni),
         |nb AS (SELECT cast(count(*) AS bigint) AS n_bi FROM bg),
         |scored AS (
         |  SELECT p.w1, p.w2, p.c_ab,
         |         round(ln(p.c_ab::DOUBLE * nu.n_uni::DOUBLE * nu.n_uni::DOUBLE
         |               / (nb.n_bi::DOUBLE * a.c::DOUBLE * b.c::DOUBLE)), 6) AS pmi
         |  FROM pairs p JOIN uni a ON p.w1 = a.w JOIN uni b ON p.w2 = b.w
         |  CROSS JOIN nu CROSS JOIN nb)
         |SELECT cast(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS int) AS rk,
         |       w1, w2, c_ab, pmi
         |FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin) { (s, dir) =>
      graft.operators.Collocations.topPmi(t(s, dir, "documents"), k = 20, minCount = 5L)
        .orderBy(col("rk"))
    },

    // Budget-constrained selection: maximal value-per-cost prefix
    // (value = distinct tokens, cost = tokens) under a 12k-token
    // budget — the fractional-knapsack greedy of data selection. The
    // ratio is one division of exact longs, so the SELECTED SET
    // replays bit-identically.
    Q("q_sample_budget",
      s"""WITH sc AS (SELECT doc_id,
         |              cast(len($toksSql) AS bigint) AS cost,
         |              cast(len(list_distinct($toksSql)) AS bigint) AS value
         |            FROM documents),
         |r AS (SELECT doc_id, cost, value, value::DOUBLE / cost::DOUBLE AS ratio
         |      FROM sc WHERE cost > 0),
         |c AS (SELECT doc_id, cost, value, ratio,
         |             cast(sum(cost) OVER (ORDER BY ratio DESC, doc_id
         |               ROWS UNBOUNDED PRECEDING) AS bigint) AS cum_cost
         |      FROM r)
         |SELECT doc_id, cost, value, round(ratio, 6) AS ratio, cum_cost
         |FROM c WHERE cum_cost <= 12000 ORDER BY ratio DESC, doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      val scored = t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("cost"),
        size(array_distinct(TextFunctions.tokens(col("text")))).as("value"))
      graft.operators.BudgetSelection.greedyPrefix(scored, "doc_id", "cost", "value",
          budget = 12000L)
        .orderBy(col("ratio").desc, col("doc_id"))
    },

    // Percentile-rank quality ensembling: three incomparable signals
    // normalized to corpus percentiles and averaged — ties share a
    // percentile by rank semantics, so the blend replays exactly.
    Q("q_text_quality_blend",
      s"""WITH sc AS (SELECT doc_id, cast(n_chars AS bigint) AS s_chars,
         |              cast(len($toksSql) AS bigint) AS s_tok,
         |              cast(len(list_distinct($toksSql)) AS bigint) AS s_distinct
         |            FROM documents),
         |pr AS (SELECT doc_id, s_chars, s_tok, s_distinct,
         |              percent_rank() OVER (ORDER BY s_chars) AS p1,
         |              percent_rank() OVER (ORDER BY s_tok) AS p2,
         |              percent_rank() OVER (ORDER BY s_distinct) AS p3
         |       FROM sc)
         |SELECT doc_id, round(p1, 6) AS pr_s_chars, round(p2, 6) AS pr_s_tok,
         |       round(p3, 6) AS pr_s_distinct, round((p1 + p2 + p3) / 3, 6) AS blend
         |FROM pr ORDER BY blend DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      val sig = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").as("s_chars"),
        TextFunctions.tokenCount(col("text")).cast("long").as("s_tok"),
        size(array_distinct(TextFunctions.tokens(col("text")))).cast("long").as("s_distinct"))
      graft.operators.QualityEnsemble.percentileBlend(sig, "doc_id",
          Seq("s_chars", "s_tok", "s_distinct"))
        .orderBy(col("blend").desc, col("doc_id")).limit(25)
    },

    // Corpus snapshot diff: added/removed/changed/unchanged by content
    // hash across two deterministic snapshot derivations — the daily
    // crawl-reconciliation primitive deciding what to reprocess.
    Q("q_source_snapshot_diff",
      """WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 != 7),
        |v2 AS (SELECT doc_id, CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END AS text
        |       FROM documents WHERE doc_id % 10 != 5),
        |h1 AS (SELECT doc_id, md5(text) AS h FROM v1),
        |h2 AS (SELECT doc_id, md5(text) AS h FROM v2),
        |d AS (SELECT coalesce(h1.doc_id, h2.doc_id) AS doc_id,
        |        CASE WHEN h1.h IS NULL THEN 'added'
        |             WHEN h2.h IS NULL THEN 'removed'
        |             WHEN h1.h = h2.h THEN 'unchanged' ELSE 'changed' END AS status
        |      FROM h1 FULL OUTER JOIN h2 ON h1.doc_id = h2.doc_id)
        |SELECT status, cast(count(*) AS int) AS n, cast(min(doc_id) AS bigint) AS min_id,
        |       cast(max(doc_id) AS bigint) AS max_id
        |FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 10 =!= 7).select(col("doc_id"), col("text"))
      val v2 = docs.filter(col("doc_id") % 10 =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 3, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      SnapshotDiff.diffStatus(v1, v2)
        .groupBy(col("status"))
        .agg(count(lit(1)).cast("int").as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("status"))
    },

    // SCD-2 history: the same two snapshot derivations folded into a
    // row-versioned [valid_from, valid_to) history — unchanged rows
    // stay open, changed rows close at v2 and reopen, deletions close,
    // additions open. Every interval edge is hash-checked.
    Q("q_source_scd2_history",
      """WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 != 7),
        |v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END) AS h
        |       FROM documents WHERE doc_id % 10 != 5),
        |hist1 AS (SELECT doc_id, h, 1 AS valid_from, cast(NULL AS int) AS valid_to FROM v1),
        |j AS (SELECT coalesce(o.doc_id, s.doc_id) AS doc_id, o.h AS h, o.valid_from, s.h AS h_new
        |      FROM hist1 o FULL OUTER JOIN v2 s ON o.doc_id = s.doc_id),
        |still AS (SELECT doc_id, h, valid_from, cast(NULL AS int) AS valid_to
        |          FROM j WHERE h IS NOT NULL AND h_new IS NOT NULL AND h = h_new),
        |closedr AS (SELECT doc_id, h, valid_from, 2 AS valid_to
        |            FROM j WHERE h IS NOT NULL AND (h_new IS NULL OR h != h_new)),
        |opened AS (SELECT doc_id, h_new AS h, 2 AS valid_from, cast(NULL AS int) AS valid_to
        |           FROM j WHERE h_new IS NOT NULL AND (h IS NULL OR h != h_new)),
        |hist2 AS (SELECT * FROM still UNION ALL SELECT * FROM closedr UNION ALL SELECT * FROM opened)
        |SELECT doc_id, h, cast(valid_from AS int) AS valid_from, valid_to,
        |       valid_to IS NULL AS is_current
        |FROM hist2 ORDER BY doc_id, valid_from""".stripMargin) { (s, dir) =>
      import graft.operators.Scd2
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val v2 = docs.filter(col("doc_id") % 10 =!= 5)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 10 === 3, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h"))
      Scd2.merge(Scd2.init(v1, version = 1, idCol = "doc_id"), v2,
          version = 2, idCol = "doc_id")
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("doc_id"), col("valid_from"))
    },

    // SCD-2 point-in-time reads: Spark reconstructs BOTH versions from
    // the built history (init + merge + snapshotAt); the oracle
    // recomputes each version directly from the source — the hash
    // match proves the history round-trips.
    Q("q_source_scd2_asof",
      """WITH v1 AS (SELECT 1 AS v, doc_id, md5(text) AS h FROM documents
        |            WHERE doc_id % 10 != 7),
        |v2 AS (SELECT 2 AS v, doc_id, md5(CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END) AS h
        |       FROM documents WHERE doc_id % 10 != 5)
        |SELECT cast(v AS int) AS v, doc_id, h
        |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |ORDER BY v, doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.Scd2
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val v2 = docs.filter(col("doc_id") % 10 =!= 5)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 10 === 3, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h"))
      val hist = Scd2.merge(Scd2.init(v1, version = 1, idCol = "doc_id"), v2,
        version = 2, idCol = "doc_id")
      Scd2.snapshotAt(hist, 1, "doc_id").withColumn("v", lit(1))
        .unionByName(Scd2.snapshotAt(hist, 2, "doc_id").withColumn("v", lit(2)))
        .select(col("v"), col("doc_id"), col("h"))
        .orderBy(col("v"), col("doc_id"))
    },

    // Deterministic negative sampling for a contrastive training set:
    // hash-sliced candidates, broadcast query set, top-k per query.
    Q("q_sample_negatives",
      """WITH q AS (SELECT doc_id AS q_id, md5(text) AS q_md5 FROM documents
        |           WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id AS neg_id, md5(text) AS c_md5 FROM documents
        |      WHERE (doc_id + 42) % 1000000007 * 2654435761 % 1000000007 % 5 = 0),
        |r AS (SELECT q_id, neg_id,
        |        (q_id % 1000000007 * 31 + neg_id % 1000000007 + 42) % 1000000007
        |          * 2654435761 % 1000000007 AS h
        |      FROM c JOIN q ON c_md5 != q_md5),
        |rk AS (SELECT q_id, neg_id,
        |         cast(row_number() OVER (PARTITION BY q_id ORDER BY h, neg_id) AS int) AS rk
        |       FROM r)
        |SELECT q_id, neg_id, rk FROM rk WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      NegativeSampler.negatives(docs.filter(col("doc_id") % 50 === 0), docs,
          k = 5, sliceMod = 5)
        .orderBy(col("q_id"), col("rk"))
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // key = -ln(u)/w with u a pure function of (doc_id, seed) — the
    // quality-weighted corpus subset is reproducible and auditable.
    Q("q_sample_weighted",
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |         -ln((('0x' || substr(md5(doc_id || ':' || 42), 1, 13))::BIGINT + 1)
        |             / 4503599627370496.0) / n_chars AS key
        |  FROM documents)
        |SELECT doc_id, n_chars, round(key, 9) AS es_key,
        |       cast(row_number() OVER (ORDER BY key, doc_id) AS int) AS rk
        |FROM keyed ORDER BY key, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      graft.operators.WeightedSampler.sampleWithoutReplacement(
          t(s, dir, "documents"), idCol = "doc_id", weightCol = "n_chars",
          k = 20, seed = 42L)
        .select(col("doc_id"), col("n_chars"),
          round(col("key"), 9).as("es_key"), col("rk"))
        .orderBy(col("rk"))
    },

    // C4-style boilerplate removal: fixed-width pseudo-lines recurring
    // in >= 2 distinct docs are dropped; docs rebuilt from the
    // surviving lines in order. Only the md5 digest rides the df
    // shuffle; the rebuild is replayed via an ordered line fold.
    Q("q_text_boilerplate",
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |lines AS (
         |  SELECT doc_id, i AS line_no,
         |         array_to_string(toks[(i*5+1):(i*5+5)], ' ') AS line
         |  FROM tok, unnest(range(greatest(1, cast(ceil(len(toks)/5.0) AS int)))) AS t(i)),
         |bp AS (SELECT md5(line) AS lh FROM lines
         |       GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |marked AS (SELECT l.doc_id, l.line_no, l.line, (lh IS NOT NULL) AS is_bp
         |           FROM lines l LEFT JOIN bp ON md5(l.line) = lh),
         |rebuilt AS (
         |  SELECT doc_id,
         |         count(*) AS n_lines,
         |         cast(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS int) AS n_removed,
         |         md5(coalesce(array_to_string(
         |           list(CASE WHEN NOT is_bp THEN line END ORDER BY line_no)
         |             FILTER (NOT is_bp), ' '), '')) AS clean_md5
         |  FROM marked GROUP BY 1)
         |SELECT doc_id, n_lines, n_removed, clean_md5
         |FROM rebuilt WHERE n_removed > 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Boilerplate.removeBoilerplate(t(s, dir, "documents"), lineTokens = 5, minDocs = 2)
        .filter(col("n_removed") > 0)
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },

    // Hybrid retrieval: BM25 lexical ranking + dense cosine ranking of
    // the same corpus (doc_id == vec_id), fused by reciprocal rank
    // (k_rrf = 60). Ranks — not float scores — cross the fusion join, so
    // the whole hybrid stack replays exactly in the oracle.
    Q("q_hybrid_rrf", {
      val cos =
        """(CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)) = 0
          | THEN 0.0
          | ELSE list_dot_product(q.qv, c.cv)
          |      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) END)""".stripMargin
      s"""WITH qt AS (
         |  SELECT * FROM (VALUES (0, 'hash'), (0, 'join'), (1, 'scan'), (1, 'filter'),
         |                        (2, 'window'), (2, 'stream')) AS v(query_id, token)),
         |tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
         |stats AS (SELECT cast(sum(dl) AS double) / count(*) AS avgdl, count(*) AS n FROM dl),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
         |       WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
         |dfreq AS (SELECT token AS dftoken, count(*) AS df FROM tf GROUP BY 1),
         |parts AS (
         |  SELECT qt.query_id, t.doc_id, t.token,
         |         ln((n - df + 0.5) / (df + 0.5) + 1) * (t.tf * 2.2)
         |           / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / avgdl)) AS part
         |  FROM tf t JOIN qt ON t.token = qt.token JOIN dfreq ON t.token = dftoken
         |    JOIN dl d ON t.doc_id = d.doc_id CROSS JOIN stats
         |  WHERE t.doc_id != qt.query_id),
         |lexscore AS (
         |  SELECT query_id, doc_id,
         |         list_reduce(list_prepend(0.0, list(part ORDER BY token)), (acc, x) -> acc + x) AS bm25
         |  FROM parts GROUP BY 1, 2),
         |lex AS (
         |  SELECT query_id, doc_id, lex_rk FROM (
         |    SELECT query_id, doc_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS lex_rk
         |    FROM lexscore) WHERE lex_rk <= 30),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |dense AS (
         |  SELECT query_id, doc_id, dense_rk FROM (
         |    SELECT q.query_id, c.vec_id AS doc_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |                              ORDER BY $cos DESC, c.vec_id) AS dense_rk
         |    FROM q CROSS JOIN c WHERE q.query_id != c.vec_id) WHERE dense_rk <= 30),
         |fused AS (
         |  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         |         coalesce(l.doc_id, d.doc_id) AS doc_id,
         |         l.lex_rk, d.dense_rk,
         |         coalesce(1.0 / (60 + l.lex_rk), 0.0) + coalesce(1.0 / (60 + d.dense_rk), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN dense d
         |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
         |SELECT query_id, doc_id, round(rrf, 6) AS rrf, lex_rk, dense_rk, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rk
         |  FROM fused) WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qt = Seq((0L, "hash"), (0L, "join"), (1L, "scan"), (1L, "filter"),
        (2L, "window"), (2L, "stream")).toDF("query_id", "token")
      val lex = HybridRetrieval.bm25PerQuery(docs, qt, topN = 30)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val dense = SimilaritySearch.bruteForceTopK(queries, emb, k = 30)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rk").as("dense_rk"))
      HybridRetrieval.rrfFuse(lex, dense, k = 10)
        .select(col("query_id"), col("doc_id"), round(col("rrf"), 6).as("rrf"),
          col("lex_rk"), col("dense_rk"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    },

    // X141 χ² keyword selection: tokens most skewed toward each language.
    // Every 2×2 cell is an exact long; χ² is a ratio of exactly-
    // representable doubles, so the ranking replays bit-for-bit.
    Q("q_text_chi2_keywords",
      """WITH tok AS (
        |  SELECT lang, unnest(list_distinct(regexp_split_to_array(lower(text), '\s+')))
        |           AS token
        |  FROM documents),
        |tl AS (SELECT token, lang, count(*) AS a FROM tok GROUP BY 1, 2),
        |tt AS (SELECT token, lang, a,
        |              sum(a) OVER (PARTITION BY token) AS tok_total FROM tl),
        |lt AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        |na AS (SELECT count(*) AS n_all FROM documents),
        |x AS (
        |  SELECT t.lang, t.token, cast(t.a AS bigint) AS a,
        |         cast(n_lang - a AS bigint) AS b,
        |         cast(tok_total - a AS bigint) AS c,
        |         cast(n_all - n_lang - (tok_total - a) AS bigint) AS d,
        |         cast(n_all AS bigint) AS n_all
        |  FROM tt t JOIN lt USING (lang) CROSS JOIN na
        |  WHERE tok_total >= 5 AND tok_total < n_all),
        |chi AS (
        |  SELECT lang, token, a,
        |         cast(n_all AS double) * cast((a*d - b*c) * (a*d - b*c) AS double)
        |           / cast((a+b) * (c+d) * (a+c) * (b+d) AS double) AS chi2
        |  FROM x),
        |rk AS (SELECT lang, token, a, chi2,
        |              row_number() OVER (PARTITION BY lang ORDER BY chi2 DESC, token)
        |                AS rk
        |       FROM chi)
        |SELECT lang, cast(rk AS int) AS rk, token, a, round(chi2, 4) AS chi2
        |FROM rk WHERE rk <= 3 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      ChiSquareKeywords.topKeywords(t(s, dir, "documents"), "lang", minDf = 5L, topK = 3)
        .select(col("cls").as("lang"), col("rk"), col("token"), col("a"),
          round(col("chi2"), 4).as("chi2"))
        .orderBy(col("lang"), col("rk"))
    },

    // X146 deterministic T5-style span corruption: the mask is a pure
    // function of (doc_id, position), so the corrupted-input/target
    // pairs replay byte-identically on both engines. Spark side is
    // zero-shuffle row-local array lambdas; the oracle re-derives every
    // pair through unnest + ordered string_agg.
    Q("q_text_span_corrupt",
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS tok,
        |               generate_subscripts(l, 1) - 1 AS pos FROM s),
        |m AS (SELECT doc_id, pos, tok,
        |             ('0x' || substr(md5(cast(doc_id AS varchar) || ':'
        |                || cast(pos AS varchar)), 1, 15))::BIGINT % 5 = 0 AS masked
        |      FROM tok)
        |SELECT doc_id,
        |       cast(count(*) AS bigint) AS n_tokens,
        |       cast(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS bigint) AS n_masked,
        |       string_agg(CASE WHEN masked THEN '<X>' ELSE tok END, ' ' ORDER BY pos)
        |         AS input_text,
        |       coalesce(string_agg(CASE WHEN masked THEN tok END, ' ' ORDER BY pos), '')
        |         AS target_text
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      SpanCorruption.corrupt(t(s, dir, "documents"), "doc_id", "text", every = 5)
        .select(col("doc_id"), col("n_tokens"), col("n_masked"),
          col("input_text"), col("target_text"))
        .orderBy(col("doc_id"))
    },

    // X147 delta-encoded posting lists: the inverted-index BUILD
    // artifact (sorted doc ids gap-encoded per token). One shuffle on
    // the token; the lag window and the final agg reuse its
    // partitioning (plan-asserted in CorpusOpsSpec).
    Q("q_text_postings_delta",
      """WITH tok AS (
        |  SELECT doc_id AS doc,
        |         unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS token
        |  FROM documents),
        |d AS (SELECT token, doc,
        |             doc - lag(doc) OVER (PARTITION BY token ORDER BY doc) AS delta
        |      FROM tok),
        |agg AS (SELECT token, count(*) AS df, min(doc) AS head_doc,
        |               max(delta) AS max_delta,
        |               string_agg(cast(delta AS varchar), ',' ORDER BY doc) AS deltas_csv
        |        FROM d GROUP BY token)
        |SELECT token, cast(df AS bigint) AS df, cast(head_doc AS bigint) AS head_doc,
        |       cast(max_delta AS bigint) AS max_delta, deltas_csv
        |FROM agg WHERE df >= 20 ORDER BY token""".stripMargin) { (s, dir) =>
      PostingsIndex.deltaPostings(t(s, dir, "documents"), "doc_id", "text", minDf = 20)
        .select(col("token"), col("df"), col("head_doc"), col("max_delta"),
          col("deltas_csv"))
        .orderBy(col("token"))
    },

    // X152 cross-source duplication matrix: exact-duplicate pairs (same
    // token-set fingerprint, the X2 definition) rolled up by unordered
    // source pair — finds sources copying from each other. Pairs come
    // from a fingerprint equi-join on the cluster-filtered slice only.
    Q("q_dedup_source_matrix",
      s"""WITH f AS (
         |  SELECT doc_id AS doc, source AS src,
         |         md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fp
         |  FROM documents),
         |d AS (SELECT * FROM f QUALIFY count(*) OVER (PARTITION BY fp) > 1),
         |p AS (SELECT least(a.src, b.src) AS source_a,
         |             greatest(a.src, b.src) AS source_b
         |      FROM d a JOIN d b ON a.fp = b.fp AND a.doc < b.doc)
         |SELECT source_a, source_b, cast(count(*) AS bigint) AS n_pairs
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      DupSourceMatrix.matrix(t(s, dir, "documents"))
        .orderBy(col("source_a"), col("source_b"))
    },

    // X196 byte-level EXACT-substring dedup (the deduplicate-text-
    // datasets / RefinedWeb exact recipe, which X91 approximates at
    // word-8-gram granularity): maximal character spans covered by
    // 20-char k-mers occurring >= 2 times corpus-wide, offsets
    // replayable via substr(text, span_start+1, span_len) in BOTH
    // engines (operators/DupSpans.scala — O(total bytes): one grouped
    // count over the k-mer stream, one semi-join back, one per-doc
    // island merge; never O(docs²)). The query runs the exact-key mode
    // the oracle can replicate; DupSpansSpec pins the 8-byte-hash
    // shuffle mode equal to it.
    Q("q_text_dupspans",
      s"""$dupSpansCte
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 20 AS span_end,
         |       max(pos) + 20 - min(pos) AS span_len, count(*) AS n_seeds
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      DupSpans.spans(t(s, dir, "documents"), k = 20, minCount = 2L)
    },

    // X199 the REMOVE half of exact-substring dedup: X196's spans
    // spliced out of the text — removal is total (both copies go, the
    // deduplicate-text-datasets default; canonical-keep is a policy
    // layer above, X174). The splice is a row-local higher-order
    // aggregate over each doc's own spans; the oracle re-derives the
    // spans and splices with a lag window + ordered string_agg.
    Q("q_text_dupwash",
      s"""$dupSpansCte,
         |spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 20 AS span_end
         |          FROM isl GROUP BY doc_id, island),
         |segs AS (
         |  SELECT s.doc_id, d.text, s.span_start, s.span_end,
         |         coalesce(lag(s.span_end) OVER (PARTITION BY s.doc_id
         |           ORDER BY s.span_start), 0) AS prev_end
         |  FROM spans s JOIN documents d USING (doc_id)),
         |agg AS (
         |  SELECT doc_id,
         |         string_agg(substr(text, CAST(prev_end AS INT) + 1,
         |                           CAST(span_start - prev_end AS INT)),
         |                    '' ORDER BY span_start) AS kept,
         |         max(span_end) AS last_end, count(*) AS n_spans,
         |         any_value(text) AS text
         |  FROM segs GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(a.kept || substr(d.text, CAST(a.last_end AS INT) + 1),
         |                d.text) AS washed_text,
         |       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |       CAST(length(d.text) - length(coalesce(
         |         a.kept || substr(d.text, CAST(a.last_end AS INT) + 1),
         |         d.text)) AS BIGINT) AS removed_chars
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |WHERE d.text IS NOT NULL
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      DupSpans.removeSpans(t(s, dir, "documents"), k = 20, minCount = 2L)
    },

    // X197 BPE tokenizer APPLY (expressions/BpeEncode.scala via
    // operators/BpeApply): the first 5 words of every document encoded
    // with a FIXED pretrained-style merge list (the realistic 100 TB
    // shape — a tokenizer is fitted once and applied everywhere; the
    // iterative FIT loop is BpeApply.fitMerges, determinism-pinned in
    // BpeApplySpec). The oracle runs the IDENTICAL merges as a DuckDB
    // recursive CTE splicing one lowest-rank occurrence per step — the
    // literal reference BPE loop — so hash equality proves the
    // single-pass-per-rank native expression implements real BPE.
    bpeEncodeQ,

    // X198 sequence packing by REAL token counts: q_text_pack_bins
    // packs on whitespace counts; this bins the same corpus on the BPE
    // token counts of X197 — the number a trainer actually budgets.
    bpePackQ,

    // X201 token IDS: X197's symbol sequences mapped through a
    // deterministic fitted vocab (count desc, symbol asc) — the actual
    // trainer input. The vocab ranking is a global row_number over the
    // vocab-sized aggregate only; the id join broadcasts it.
    bpeIdsQ,

    // X206 the VOCAB artifact itself (sym, tok_id, cnt) — the table a
    // decoder needs to map X201's ids back to text; same deterministic
    // ranking, exported standalone.
    bpeVocabQ,

    // X208 the DECODE closure: X201 ids → X206 vocab → text, pinned
    // equal to the encoder's input words per row.
    bpeDecodeQ,

    // X205 INCREMENTAL ingestion dedup against a STORED fingerprint
    // index (operators/IncrementalDedup.scala): the accumulated corpus
    // (doc_id % 10 != 3) writes a fingerprints-only index partitioned
    // by fingerprint prefix; the "new batch" (doc_id % 10 == 3) probes
    // it — corpus text is never re-read, the probe shuffles 32-char
    // keys only. Oracle recomputes both sides' fingerprints directly.
    Q("q_dedup_incremental",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |         md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint
         |  FROM documents),
         |idx AS (SELECT fingerprint, cast(min(doc_id) AS bigint) AS dup_of
         |        FROM fp WHERE doc_id % 10 <> 3 GROUP BY fingerprint)
         |SELECT f.doc_id, i.dup_of, f.fingerprint
         |FROM fp f JOIN idx i USING (fingerprint)
         |WHERE f.doc_id % 10 = 3
         |ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val path = fpIndexPath(dir, "probe")
      IncrementalDedup.writeIndex(docs.filter(col("doc_id") % 10 =!= 3), path)
      IncrementalDedup.probe(s, docs.filter(col("doc_id") % 10 === 3), path)
    },

    // X205 part 2: IDEMPOTENT index refresh — the batch's novel
    // fingerprints are anti-joined against the stored index and
    // appended partition-aligned (no history rewrite). The query runs
    // the refresh TWICE on the same batch before reading the index
    // back: hash-equality with the oracle (which unions corpus and
    // novel-batch clusters exactly once) proves the second refresh was
    // a no-op — run-twice ≡ run-once.
    Q("q_dedup_incremental_refresh",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |         md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint
         |  FROM documents),
         |corpus AS (SELECT fingerprint, cast(min(doc_id) AS bigint) AS dup_of
         |           FROM fp WHERE doc_id % 10 <> 3 GROUP BY fingerprint),
         |novel AS (SELECT f.fingerprint, cast(min(f.doc_id) AS bigint) AS dup_of
         |          FROM fp f
         |          WHERE f.doc_id % 10 = 3 AND NOT EXISTS (
         |            SELECT 1 FROM corpus c WHERE c.fingerprint = f.fingerprint)
         |          GROUP BY f.fingerprint)
         |SELECT fingerprint, dup_of
         |FROM (SELECT * FROM corpus UNION ALL SELECT * FROM novel)
         |ORDER BY fingerprint""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val path = fpIndexPath(dir, "refresh")
      val batch = docs.filter(col("doc_id") % 10 === 3)
      IncrementalDedup.writeIndex(docs.filter(col("doc_id") % 10 =!= 3), path)
      IncrementalDedup.refreshIndex(s, batch, path)
      IncrementalDedup.refreshIndex(s, batch, path) // idempotent: appends nothing
      s.read.parquet(path)
        .select(col("fingerprint"), col("dup_of"))
        .orderBy(col("fingerprint"))
    },

    // X203 length-bucketed micro-batching (the NMT/pretraining padding
    // cut): whitespace token counts bucketed at fixed edges, batched
    // within (shard, bucket) by a deterministic row_number — per-batch
    // padded_tokens is the number a trainer multiplies by FLOPs/token.
    // Shard-parallel like X20 (operators/LengthBatching.scala).
    Q("q_text_length_batches",
      """WITH sized AS (
        |  SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS len,
        |         doc_id % 8 AS shard
        |  FROM documents WHERE text IS NOT NULL),
        |bucketed AS (
        |  SELECT doc_id, len, shard,
        |         (CASE WHEN len >= 16 THEN 1 ELSE 0 END +
        |          CASE WHEN len >= 32 THEN 1 ELSE 0 END +
        |          CASE WHEN len >= 48 THEN 1 ELSE 0 END +
        |          CASE WHEN len >= 64 THEN 1 ELSE 0 END) AS bucket
        |  FROM sized),
        |batched AS (
        |  SELECT shard, bucket, len,
        |         CAST(floor((row_number() OVER (PARTITION BY shard, bucket ORDER BY doc_id)
        |               - 1) / 16) AS BIGINT) AS batch
        |  FROM bucketed)
        |SELECT cast(shard AS bigint) AS shard, bucket, batch,
        |       count(*) AS n_seqs, max(len) AS max_len,
        |       cast(sum(len) AS bigint) AS sum_len,
        |       cast(count(*) * max(len) - sum(len) AS bigint) AS padded_tokens
        |FROM batched GROUP BY shard, bucket, batch
        |ORDER BY shard, bucket, batch""".stripMargin) { (s, dir) =>
      val sized = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
      LengthBatching.paddingStats(LengthBatching.assign(
        sized, idCol = "doc_id", lenCol = "n_tok",
        edges = Seq(16L, 32L, 48L, 64L), batchSize = 16, nShards = 8))
    })

  /** Shared oracle CTE for the exact-substring recipe (X196/X199): the
    * 20-char k-mer stream, duplicate grams, seed positions, islands.
    */
  private lazy val dupSpansCte: String =
    """WITH km0 AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, greatest(length(text) - 20 + 1, 0))) AS pos
      |  FROM documents WHERE text IS NOT NULL
      |),
      |km AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |              substr(text, CAST(pos AS INT) + 1, 20) AS gram FROM km0),
      |dup AS (SELECT gram FROM km GROUP BY gram HAVING count(*) >= 2),
      |seeds AS (SELECT km.doc_id, km.pos FROM km JOIN dup USING (gram)),
      |lagd AS (SELECT doc_id, pos,
      |                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |         FROM seeds),
      |isl AS (SELECT doc_id, pos,
      |               sum(CASE WHEN prev IS NULL OR pos > prev + 20 THEN 1 ELSE 0 END)
      |                 OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |        FROM lagd)""".stripMargin

  /** Fixed demo merge list (training-consistent — every compound symbol
    * is produced before use; BpeApply.requireConsistent re-checks).
    * Chosen to fire on the synthetic corpus vocabulary (table / value /
    * row / scan / the / data...).
    */
  private lazy val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "l" -> "e", "tab" -> "le",
    "v" -> "a", "va" -> "l", "u" -> "e", "val" -> "ue",
    "r" -> "o", "ro" -> "w", "s" -> "c", "sc" -> "a", "sca" -> "n",
    "t" -> "h", "th" -> "e", "d" -> "a", "da" -> "t", "dat" -> "a")

  /** Shared oracle prelude: per-(doc, word_pos) BPE encoding of the
    * first 5 words via the recursive reference loop.
    */
  private lazy val bpeOracleEnc: String = {
    val (caseExpr, anyPos) = BpeApply.oracleCase(bpeMerges)
    s"""WITH RECURSIVE words0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS l
       |  FROM documents WHERE text IS NOT NULL),
       |w AS (
       |  SELECT doc_id, CAST(i AS INT) + 1 AS word_pos, l[CAST(i AS INT) + 1] AS word
       |  FROM (SELECT doc_id, l, unnest(range(0, least(len(l), 5))) AS i FROM words0)
       |  WHERE l[CAST(i AS INT) + 1] <> ''),
       |base AS (
       |  SELECT doc_id, word_pos, word,
       |         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s FROM w),
       |enc AS (
       |  SELECT doc_id, word_pos, word, s FROM base
       |  UNION ALL
       |  SELECT doc_id, word_pos, word, $caseExpr AS s FROM enc WHERE $anyPos),
       |done AS (
       |  SELECT doc_id, word_pos, word, trim(s) AS encoded,
       |         CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_tokens
       |  FROM enc WHERE NOT ($anyPos))""".stripMargin
  }

  private lazy val bpeEncodeQ: Q = Q("q_text_bpe_encode",
    s"""$bpeOracleEnc
       |SELECT doc_id, word_pos, word, encoded, n_tokens
       |FROM done ORDER BY doc_id, word_pos""".stripMargin) { (s, dir) =>
    BpeApply.encodeWords(t(s, dir, "documents"), bpeMerges, maxWords = 5)
      .orderBy(col("doc_id"), col("word_pos"))
  }

  private lazy val bpeIdsQ: Q = Q("q_text_bpe_ids",
    s"""$bpeOracleEnc,
       |toks AS (
       |  SELECT doc_id, word_pos, CAST(i AS INT) AS ti,
       |         sy[CAST(i AS INT) + 1] AS sym
       |  FROM (SELECT doc_id, word_pos, string_split(encoded, ' ') AS sy,
       |               unnest(range(0, len(string_split(encoded, ' ')))) AS i
       |        FROM done)),
       |vocab AS (SELECT sym, count(*) AS cnt FROM toks GROUP BY sym),
       |ranked AS (SELECT sym,
       |                  CAST(row_number() OVER (ORDER BY cnt DESC, sym) AS BIGINT)
       |                    AS tok_id
       |           FROM vocab),
       |j AS (SELECT t.doc_id, t.word_pos, t.ti, r.tok_id
       |      FROM toks t JOIN ranked r USING (sym))
       |SELECT doc_id, word_pos,
       |       string_agg(tok_id::VARCHAR, ',' ORDER BY ti) AS ids_csv,
       |       CAST(count(*) AS BIGINT) AS n_tokens
       |FROM j GROUP BY doc_id, word_pos
       |ORDER BY doc_id, word_pos""".stripMargin) { (s, dir) =>
    BpeApply.tokenIds(
      BpeApply.encodeWords(t(s, dir, "documents"), bpeMerges, maxWords = 5))
  }

  private lazy val bpeVocabQ: Q = Q("q_text_bpe_vocab",
    s"""$bpeOracleEnc,
       |toks AS (
       |  SELECT sy[CAST(i AS INT) + 1] AS sym
       |  FROM (SELECT string_split(encoded, ' ') AS sy,
       |               unnest(range(0, len(string_split(encoded, ' ')))) AS i
       |        FROM done)),
       |vocab AS (SELECT sym, count(*) AS cnt FROM toks GROUP BY sym)
       |SELECT sym,
       |       CAST(row_number() OVER (ORDER BY cnt DESC, sym) AS BIGINT) AS tok_id,
       |       CAST(cnt AS BIGINT) AS cnt
       |FROM vocab ORDER BY tok_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    BpeApply.encodeWords(t(s, dir, "documents"), bpeMerges, maxWords = 5)
      .select(explode(split(col("encoded"), " ")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("cnt"))
      .withColumn("tok_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("sym"))).cast("long"))
      .select(col("sym"), col("tok_id"), col("cnt"))
      .orderBy(col("tok_id"))
  }

  /** X208 BPE DECODE closure: X201's token ids round-trip back to text
    * through X206's vocab artifact — ids explode, join tok_id → sym,
    * symbols reassemble in order with no separator. `decoded_word` is
    * emitted NEXT TO the encoder's input `word`: hash equality with the
    * oracle (which performs the same id → sym join + ordered
    * string_agg, and selects the original word from its own encoding
    * CTE) pins decode(encode(w)) == w per row — the guarantee a trainer
    * needs before shipping ids instead of text.
    */
  private lazy val bpeDecodeQ: Q = Q("q_text_bpe_decode",
    s"""$bpeOracleEnc,
       |toks AS (
       |  SELECT doc_id, word_pos, CAST(i AS INT) AS ti,
       |         sy[CAST(i AS INT) + 1] AS sym
       |  FROM (SELECT doc_id, word_pos, string_split(encoded, ' ') AS sy,
       |               unnest(range(0, len(string_split(encoded, ' ')))) AS i
       |        FROM done)),
       |vocab AS (SELECT sym, count(*) AS cnt FROM toks GROUP BY sym),
       |ranked AS (SELECT sym,
       |                  CAST(row_number() OVER (ORDER BY cnt DESC, sym) AS BIGINT)
       |                    AS tok_id
       |           FROM vocab),
       |j AS (SELECT t.doc_id, t.word_pos, t.ti, r.tok_id
       |      FROM toks t JOIN ranked r USING (sym)),
       |dec AS (SELECT j.doc_id, j.word_pos,
       |               string_agg(r2.sym, '' ORDER BY j.ti) AS decoded_word,
       |               CAST(count(*) AS BIGINT) AS n_tokens
       |        FROM j JOIN ranked r2 USING (tok_id)
       |        GROUP BY j.doc_id, j.word_pos)
       |SELECT d.doc_id, d.word_pos, w.word, d.decoded_word, d.n_tokens
       |FROM dec d JOIN done w USING (doc_id, word_pos)
       |ORDER BY doc_id, word_pos""".stripMargin) { (s, dir) =>
    val enc = BpeApply.encodeWords(t(s, dir, "documents"), bpeMerges, maxWords = 5)
    val decoded = BpeApply.decodeIds(BpeApply.tokenIds(enc), BpeApply.vocabOf(enc))
    decoded
      .join(enc.select(col("doc_id"), col("word_pos"), col("word")),
        Seq("doc_id", "word_pos"))
      .select(col("doc_id"), col("word_pos"), col("word"),
        col("decoded_word"), col("n_tokens"))
      .orderBy(col("doc_id"), col("word_pos"))
  }

  private lazy val bpePackQ: Q = Q("q_text_pack_bins_bpe",
    s"""$bpeOracleEnc,
       |tok AS (SELECT doc_id, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |        FROM done GROUP BY doc_id),
       |placed AS (
       |  SELECT doc_id, n_tokens, doc_id % 8 AS shard,
       |         coalesce(sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
       |  FROM tok)
       |SELECT cast(shard AS bigint) AS shard,
       |       cast(floor(start_tok / 64) AS bigint) AS bin,
       |       count(*) AS n_docs, cast(sum(n_tokens) AS bigint) AS bin_tokens,
       |       cast(min(doc_id) AS bigint) AS first_doc
       |FROM placed GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin) { (s, dir) =>
    val sized = BpeApply.encodeWords(t(s, dir, "documents"), bpeMerges, maxWords = 5)
      .groupBy(col("doc_id")).agg(sum(col("n_tokens")).as("n_bpe"))
    CorpusPacking.packByTokenBudget(sized, idCol = "doc_id",
        nTokensCol = "n_bpe", budgetTokens = 64L, nShards = 8)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("shard"), col("bin"))
  }
}
