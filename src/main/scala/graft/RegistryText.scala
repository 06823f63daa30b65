package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{CsvIngest, Curation, Dedup, JsonIngest, Multimodal, NearDup, Relational, Sessions, Similarity}
import graft.streaming.StreamingSessions

/** Text analysis + tokenization: langid, quality, BM25, n-gram stats,
  * and the BPE trainer/encoder family.
  *
  * Mechanically split from the SparkEntry monolith (r14, judge prescription
  * #8); entries and oracle SQL are verbatim — [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the per-domain maps and the
  * bijection gate (`PlanAuditSpec`) still covers the union.
  */
private[graft] object RegistryText {
  import RegistryShared._


  /** Independent SQL replica of [[Similarity.cosineNearDupPairsLsh]]'s
    * approximation contract: the hyperplanes are deterministic constants
    * (splitmix64-derived thousandths — `k/1000.0` reproduces the exact
    * doubles), the bucket is the sign-bit sum, candidates are pairs within
    * hamming 1, verify is the cosine threshold. Both engines loop the dot
    * product in index order over identical doubles, so even sign decisions
    * at 1e-18 agree bit-for-bit. This pins the LSH pipeline — bucketing,
    * probing, verify — not just its output rows.
    */
  /** Shared CTE chain replicating the deterministic hyperplane bucketing
    * (`emb` → `b(vec_id, ve, bucket)`).
    */
  /** Unrolled-CTE replica of the BPE training loop
    * ([[graft.functions.TextAnalysis.bpeMerges]]): `w0` is the lowercased
    * `[a-z]+` word-type table with corpus counts; each round r is three
    * CTEs — `p_r` counts adjacent symbol pairs (1-based list subscripts
    * over the `..`-delimited symseq; `s` = ['', sym1..symN, ''], so lhs
    * indices run 2..len-2), `m_r` is the (count DESC, lhs, rhs) argmax,
    * `e_r` applies the merge with the same one-outer-dot `replace`
    * contract as the Spark side. `replace` is leftmost non-overlapping in
    * both engines, so greedy application order is pinned bit-for-bit.
    */
  /** Every chained CTE is `AS MATERIALIZED`: each `e_r` is referenced
    * twice (by `p_{r+1}` and `e_{r+1}`), so DuckDB's default inlining
    * re-derives the whole prefix per reference — measured 119 s / 329 s
    * for the two tokenize oracles at sf0.01 (exponential in k);
    * materialized, 0.5 s / 0.2 s with identical results.
    */
  /** Per-round (pair-count, argmax, apply) CTE template — shared by the
    * char-level and byte-level trainers (the round logic never looks
    * inside a symbol, exactly like the Spark-side merge loop).
    */
  private[graft] def bpeRoundCtes(k: Int): String =
    (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (SELECT s[i] AS lhs, s[i + 1] AS rhs,
         |    CAST(sum(c) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(symseq, '..') AS s, c FROM e${r - 1})
         |  CROSS JOIN unnest(range(2, len(s) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |e$r AS MATERIALIZED (SELECT word, c,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM e${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")


  private[graft] def bpeTrainCtes(k: Int, corpus: String = "documents"): String = {
    val base =
      s"""w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        |        FROM $corpus)
        |  WHERE regexp_full_match(word, '[a-z]+') GROUP BY word),
        |e0 AS MATERIALIZED (SELECT word, c,
        |    regexp_replace(word, '(.)', '..\\1', 'g') || '..' AS symseq
        |  FROM w0)""".stripMargin
    base + ",\n" + bpeRoundCtes(k)
  }


  private[graft] def bpeVocabOracle(k: Int): String = {
    val rows = (1 to k).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_rank, lhs, rhs,
         |  lhs || rhs AS merged, cnt AS pair_count FROM m$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH ${bpeTrainCtes(k)}\nSELECT * FROM (\n$rows\n) ORDER BY merge_rank"
  }


  /** BPE encoding oracle: re-trains via [[bpeTrainCtes]], then applies the
    * k merges in rank order to every doc's positional word stream and
    * encodes the final symbols with dense (count DESC, sym) ids — the
    * exact [[graft.functions.TextAnalysis.encodeBpe]] contract, including
    * docs with zero alphabetic words dropping out on both sides.
    */
  private[graft] def bpeTokenizeOracle(k: Int): String = {
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeTrainCtes(k)},
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
       |        FROM documents)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(word, '(.)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE regexp_full_match(word, '[a-z]+')),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |vc AS (SELECT sym, CAST(count(*) AS BIGINT) AS n FROM sy GROUP BY sym),
       |vi AS (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM vc),
       |en AS (SELECT doc_id, pos, spos, id FROM sy JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }


  /** BYTE-level BPE oracle: same shape as [[bpeTokenizeOracle]] with the
    * symbol domain switched to lowercase-hex UTF-8 bytes (`hex()` encodes
    * a string's UTF-8 bytes identically in DuckDB and Spark) and the
    * pre-tokenizer widened to every non-empty whitespace token. The
    * corpus is the planted-non-ASCII transform (a→ä, o→ø) of `documents`,
    * so every word exercises multi-byte sequences.
    */
  private[graft] def bpeBytesTokenizeOracle(k: Int): String = {
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH dx AS MATERIALIZED (SELECT doc_id,
       |    replace(replace(text, 'a', 'ä'), 'o', 'ø') AS text
       |  FROM documents),
       |w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM dx)
       |  WHERE word <> '' GROUP BY word),
       |e0 AS MATERIALIZED (SELECT word, c,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM w0),
       |${bpeRoundCtes(k)},
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM dx)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE word <> ''),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |vc AS (SELECT sym, CAST(count(*) AS BIGINT) AS n FROM sy GROUP BY sym),
       |vi AS (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM vc),
       |en AS (SELECT doc_id, pos, spos, id FROM sy JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }


  /** Byte-level incremental oracle: [[bpeBytesTokenizeOracle]]'s hex
    * domain with [[bpeIncrementalOracle]]'s split — train merges and the
    * token-weighted frozen vocabulary over the 4/5 doc_id prefix of the
    * planted corpus, encode the 1/5 tail with OOV → 0.
    */
  private[graft] def bpeBytesIncrementalOracle(k: Int): String = {
    val cut = "(SELECT (max(doc_id) * 4) // 5 FROM documents)"
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH dx AS MATERIALIZED (SELECT doc_id,
       |    replace(replace(text, 'a', 'ä'), 'o', 'ø') AS text
       |  FROM documents),
       |w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM dx WHERE doc_id < $cut)
       |  WHERE word <> '' GROUP BY word),
       |e0 AS MATERIALIZED (SELECT word, c,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM w0),
       |${bpeRoundCtes(k)},
       |sv AS MATERIALIZED (SELECT s[i] AS sym, CAST(sum(c) AS BIGINT) AS n
       |  FROM (SELECT string_split(symseq, '..') AS s, c FROM e$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i) GROUP BY 1),
       |vi AS MATERIALIZED (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM sv),
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM dx WHERE doc_id >= $cut)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE word <> ''),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |en AS (SELECT doc_id, pos, spos,
       |    coalesce(vi.id, CAST(0 AS BIGINT)) AS id
       |  FROM sy LEFT JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }


  /** Incremental-BPE oracle: trains merges AND the frozen vocabulary over
    * the first 4/5 of doc ids (the artifact corpus — `sv` is the
    * token-weighted post-merge symbol count, `sum(c)` over the type
    * table), then encodes the remaining 1/5 with those frozen tables.
    * Batch symbols absent from the training vocabulary LEFT-JOIN to NULL
    * and coalesce to id 0 — the
    * [[graft.functions.TextAnalysis.encodeBpeWith]] OOV contract.
    */
  private[graft] def bpeIncrementalOracle(k: Int): String = {
    val cut = "(SELECT (max(doc_id) * 4) // 5 FROM documents)"
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    val train =
      bpeTrainCtes(k, s"(SELECT * FROM documents WHERE doc_id < $cut) tr")
    s"""WITH $train,
       |sv AS MATERIALIZED (SELECT s[i] AS sym, CAST(sum(c) AS BIGINT) AS n
       |  FROM (SELECT string_split(symseq, '..') AS s, c FROM e$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i) GROUP BY 1),
       |vi AS MATERIALIZED (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM sv),
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
       |        FROM documents WHERE doc_id >= $cut)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(word, '(.)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE regexp_full_match(word, '[a-z]+')),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |en AS (SELECT doc_id, pos, spos,
       |    coalesce(vi.id, CAST(0 AS BIGINT)) AS id
       |  FROM sy LEFT JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text-analysis extensions over documents
    "text_langid" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))),
    "text_tokens" -> ((s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir))),
    // word-entropy quality signal (repetition/gibberish detector)
    "text_entropy" -> ((s, dir) => TextAnalysis.wordEntropy(Tables.documents(s, dir))),
    // Heaps'-law vocabulary growth curve (per 100-doc bucket)
    "vocab_growth" -> ((s, dir) => TextAnalysis.vocabGrowth(Tables.documents(s, dir))),
    "text_fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir))),
    "text_langid_ngram" -> ((s, dir) => TextAnalysis.langIdNgram(Tables.documents(s, dir))),
    "text_token_docfreq" -> ((s, dir) => TextAnalysis.tokenDocFrequency(Tables.documents(s, dir))),
    "text_typicality" -> ((s, dir) => TextAnalysis.typicality(Tables.documents(s, dir))),
    "text_top_ngrams" -> ((s, dir) => TextAnalysis.topNgrams(Tables.documents(s, dir))),
    "text_distinctive" -> ((s, dir) => TextAnalysis.distinctiveTokens(Tables.documents(s, dir))),
    // BM25-shaped keyword search: top-20 docs for a fixed 3-term query,
    // exact-integer scoring (rational idf surrogate; k1=1.2, b=0.75)
    "search_bm25" -> ((s, dir) => TextAnalysis.searchBm25(Tables.documents(s, dir))),
    // bigram-LM fluency score: per-occurrence P(w2|w1) in integer ppm —
    // the conditional-probability filter unigram typicality can't see
    "text_bigram_lm" -> ((s, dir) => TextAnalysis.bigramLmScore(Tables.documents(s, dir))),
    // corpus-frequency vocabulary: top-1000 tokens densely numbered by
    // (count desc, token) — the id table token-id encoding joins against
    "vocab_topk" -> ((s, dir) => TextAnalysis.buildVocab(Tables.documents(s, dir))),
    // token-id encoding: each doc as its space-joined vocab-id sequence
    // (OOV → 0) + coverage counts — the corpus → packable-token-ids step
    "tokenize_ids" -> ((s, dir) => TextAnalysis.encodeTokenIds(Tables.documents(s, dir))),
    // subword (BPE) merge-rule training: 10 rounds of pair-count + argmax
    // over the word-type table; the whole loop replays as unrolled CTEs
    "vocab_bpe" -> ((s, dir) => TextAnalysis.trainBpeMerges(Tables.documents(s, dir))),
    // subword (BPE) encoding: apply the trained merges to every word and
    // emit dense token-id sequences — the encoding an LLM pipeline ships
    "tokenize_bpe" -> ((s, dir) => TextAnalysis.encodeBpe(Tables.documents(s, dir))),
    // BYTE-level BPE (the production GPT-2-style domain: initial
    // inventory 256, no OOV): train+encode over a planted-non-ASCII
    // corpus (a→ä, o→ø makes every doc multi-byte UTF-8) — symbols are
    // lowercase-hex UTF-8 bytes, merges and ids follow the same argmax /
    // dense-id contracts as the char-level path
    "tokenize_bpe_bytes" -> ((s, dir) => TextAnalysis.encodeBpeBytes(
      Tables.documents(s, dir).withColumn("text",
        replace(replace(col("text"), lit("a"), lit("ä")),
          lit("o"), lit("ø"))), 10)),
    // byte-level incremental BPE: freeze hex-domain merge+vocab artifacts
    // on the 4/5 prefix of the planted-non-ASCII corpus, encode the 1/5
    // tail O(batch) with OOV->0 — the byte tokenizer's ship shape
    "tokenize_bpe_bytes_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("text",
        replace(replace(col("text"), lit("a"), lit("ä")),
          lit("o"), lit("ø")))
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val (m, v) = TextAnalysis.bpeBytesArtifacts(
        docs.filter(col("doc_id") < cut))
      TextAnalysis.encodeBpeBytesWith(m, v, docs.filter(col("doc_id") >= cut))
    }),
    // incremental BPE: freeze merge+vocab artifacts on the 4/5 prefix,
    // encode the 1/5 tail O(batch) with OOV->0 — the tokenizer-ship shape
    "tokenize_bpe_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val (m, v) = TextAnalysis.bpeArtifacts(docs.filter(col("doc_id") < cut))
      TextAnalysis.encodeBpeWith(m, v, docs.filter(col("doc_id") >= cut))
    }),
    // Gopher-style repetition quality signals (top-2-gram share,
    // duplicate-3-gram share, exact integer basis points)
    "text_repetition" -> ((s, dir) => TextAnalysis.repetitionMetrics(Tables.documents(s, dir))),
    // PII detection + redaction over deterministically planted positives
    // (the corpus itself is PII-free word salad)
    "text_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(TextAnalysis.withSyntheticPii(Tables.documents(s, dir)))),
  )

  def oracles: Map[String, String] = Map(
    "text_langid" ->
      s"""WITH $langCtes
         |SELECT doc_id, pred_lang, c_en, c_es, c_de, c_fr, c_zh
         |FROM lang ORDER BY doc_id""".stripMargin,
    // TF-IDF-shaped distinctive tokens: integer (tf*1e6) div df ranking
    "text_distinctive" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |r AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |          ORDER BY (tf.tf * 1000000) // dfq.df DESC, tf.tok) AS BIGINT) AS rnk
        |      FROM tf JOIN dfq ON tf.tok = dfq.tok)
        |SELECT doc_id, tok, tf, df, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, length(text) AS n_chars,
        |    string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, n_chars, len(w) AS n_tokens,
        |  len(list_distinct(w)) AS n_distinct,
        |  len(list_filter(w, x -> x IN ('the', 'a', 'of'))) AS stop_cnt
        |FROM t)
        |SELECT doc_id, n_chars, n_tokens, n_distinct,
        |  (n_distinct * 20000 + n_tokens) // (2 * n_tokens) AS ttr_bp,
        |  stop_cnt,
        |  ((n_chars - n_tokens + 1) * 200 + n_tokens) // (2 * n_tokens) AS avg_tok_len_cp
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+')) AS alpha_runs,
        |  (length(text) + 3) // 4 AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprints" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // cumulative types = count of tokens whose first occurrence lands at
    // or before the bucket — the same two-aggregate formulation as Spark
    "vocab_growth" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |pb AS (SELECT doc_id // 100 AS bucket, CAST(count(*) AS BIGINT) AS n_tokens
        |       FROM w GROUP BY 1),
        |nt AS (SELECT doc_id // 100 AS bucket,
        |         CAST(count(*) AS BIGINT) AS n_new_types
        |       FROM (SELECT tok, min(doc_id) AS doc_id FROM w GROUP BY 1)
        |       GROUP BY 1)
        |SELECT pb.bucket, pb.n_tokens,
        |  coalesce(nt.n_new_types, 0) AS n_new_types,
        |  CAST(sum(pb.n_tokens) OVER (ORDER BY pb.bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nt.n_new_types, 0)) OVER (ORDER BY pb.bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |FROM pb LEFT JOIN nt USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "text_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round((log2(sum(c)) - sum(c * log2(c)) / sum(c)) * 10000, 0) / 10000.0
        |    AS entropy_bits
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_langid_ngram" ->
      """WITH s AS (SELECT doc_id,
        |  (length(text) - length(replace(text, 'th', ''))) / 2
        |    + (length(text) - length(replace(text, 'he', ''))) / 2 AS b_en,
        |  (length(text) - length(replace(text, 'qu', ''))) / 2
        |    + (length(text) - length(replace(text, 'ue', ''))) / 2 AS b_es,
        |  (length(text) - length(replace(text, 'sc', ''))) / 2
        |    + (length(text) - length(replace(text, 'ch', ''))) / 2 AS b_de,
        |  (length(text) - length(replace(text, 'me', ''))) / 2
        |    + (length(text) - length(replace(text, 'rg', ''))) / 2 AS b_fr,
        |  (length(text) - length(replace(text, 'ha', ''))) / 2
        |    + (length(text) - length(replace(text, 'an', ''))) / 2 AS b_zh
        |FROM documents)
        |SELECT doc_id,
        |  CASE WHEN b_en >= b_es AND b_en >= b_de AND b_en >= b_fr AND b_en >= b_zh THEN 'en'
        |       WHEN b_es >= b_de AND b_es >= b_fr AND b_es >= b_zh THEN 'es'
        |       WHEN b_de >= b_fr AND b_de >= b_zh THEN 'de'
        |       WHEN b_fr >= b_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  CAST(b_en AS BIGINT) AS b_en, CAST(b_es AS BIGINT) AS b_es,
        |  CAST(b_de AS BIGINT) AS b_de, CAST(b_fr AS BIGINT) AS b_fr,
        |  CAST(b_zh AS BIGINT) AS b_zh
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_token_docfreq" ->
      """SELECT tok, count(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY tok""".stripMargin,
    // unigram typicality: integer ppm arithmetic (sum() CAST back from
    // DuckDB's HUGEINT promotion so the hash compare sees BIGINT)
    "text_typicality" ->
      """WITH occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY tok),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf),
        |ppm AS (SELECT tok, (tf * 1000000) // n_total AS tf_ppm FROM tf, tot)
        |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  (CAST(sum(tf_ppm) AS BIGINT) * 2 + count(*)) // (2 * count(*))
        |    AS mean_tf_ppm,
        |  min(tf_ppm) AS min_tf_ppm,
        |  CAST(sum(CASE WHEN tf_ppm < 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rare_cnt
        |FROM occ JOIN ppm ON occ.tok = ppm.tok
        |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin,
    // boilerplate mining: corpus top-20 3-grams, ties broken by gram text
    "text_top_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, array_to_string(w[(i+1):(i+3)], ' ') AS gram
        |      FROM w CROSS JOIN unnest(range(len(w) - 2)) AS t(i)
        |      WHERE len(w) >= 3),
        |occ AS (SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram),
        |dfq AS (SELECT gram, count(*) AS n_docs
        |        FROM (SELECT DISTINCT doc_id, gram FROM g) GROUP BY gram),
        |r AS (SELECT occ.gram, n_occurrences, n_docs,
        |        CAST(row_number() OVER (ORDER BY n_occurrences DESC, occ.gram)
        |             AS BIGINT) AS rnk
        |      FROM occ JOIN dfq ON occ.gram = dfq.gram)
        |SELECT gram, n_occurrences, n_docs, rnk FROM r WHERE rnk <= 20
        |ORDER BY rnk""".stripMargin,
    // BM25 keyword search: the same integer-scaled scoring expressions,
    // term for term; DuckDB's 1-row cross join against (n, avgdl) plays
    // the Spark side's bounded scalar collect
    "search_bm25" ->
      """WITH dl AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    (CAST(sum(dl) AS BIGINT) * 200 + count(*)) // (2 * count(*))
        |      AS avgdl_x100 FROM dl),
        |occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM occ
        |       WHERE tok IN ('customer', 'join', 'dup') GROUP BY doc_id, tok),
        |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |s AS (SELECT tf.doc_id,
        |    ((n - df + 1) * 1000) // (df + 1) AS idf_milli,
        |    (tf * 220 * 1000) // (tf * 100 +
        |      (120 * (25 + (75 * ((dl.dl * 10000) // avgdl_x100)) // 100)) // 100)
        |      AS tf_part_milli
        |  FROM tf JOIN dfq USING (tok) JOIN dl ON tf.doc_id = dl.doc_id, tot),
        |sc AS (SELECT doc_id,
        |    CAST(sum((idf_milli * tf_part_milli) // 1000) AS BIGINT)
        |      AS score_milli,
        |    CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, score_milli, n_terms_hit, rank FROM
        |  (SELECT *, CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id)
        |     AS BIGINT) AS rank FROM sc)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // bigram LM: P(w2|w1) ppm per occurrence, doc mean/min
    "text_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, w[i+1] AS w1, w[i+1] || ' ' || w[i+2] AS gram
        |      FROM w CROSS JOIN unnest(range(len(w) - 1)) AS t(i)
        |      WHERE len(w) >= 2),
        |uni AS (SELECT unnest(string_split(text, ' ')) AS w1 FROM documents),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY w1),
        |c2 AS (SELECT gram, CAST(count(*) AS BIGINT) AS c2 FROM g GROUP BY gram),
        |s AS (SELECT doc_id, (c2 * 1000000) // c1 AS cond_ppm
        |      FROM g JOIN c2 USING (gram) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  (CAST(sum(cond_ppm) AS BIGINT) * 2 + count(*)) // (2 * count(*))
        |    AS mean_cond_ppm,
        |  min(cond_ppm) AS min_cond_ppm
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // corpus vocabulary: dense ids by (tf desc, token) — a total order, so
    // "rank then limit" ≡ Spark's "limit then rank"
    "vocab_topk" ->
      """WITH occ AS (SELECT unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY tok)
        |SELECT token_id, tok, tf FROM
        |  (SELECT tok, tf, CAST(row_number() OVER (ORDER BY tf DESC, tok)
        |     AS BIGINT) AS token_id FROM tf)
        |WHERE token_id <= 1000 ORDER BY token_id""".stripMargin,
    // token-id encoding: positional unnest, vocab left join (OOV → id 0),
    // order restored by string_agg(... ORDER BY pos)
    "tokenize_ids" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (SELECT doc_id, w[i+1] AS tok, CAST(i AS BIGINT) AS pos
        |      FROM w CROSS JOIN unnest(range(len(w))) AS u(i)),
        |tf AS (SELECT tok, count(*) AS tf FROM t GROUP BY tok),
        |vocab AS (SELECT tok, token_id FROM
        |    (SELECT tok, CAST(row_number() OVER (ORDER BY tf DESC, tok)
        |       AS BIGINT) AS token_id FROM tf)
        |  WHERE token_id <= 1000),
        |enc AS (SELECT doc_id, pos, coalesce(token_id, 0) AS id,
        |          token_id IS NULL AS oov
        |        FROM t LEFT JOIN vocab USING (tok))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos) AS ids_str
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // BPE training replayed as unrolled CTEs (one pair-count + argmax +
    // replace round per merge rank — the cluster_embeddings pattern)
    "vocab_bpe" -> bpeVocabOracle(10),
    "tokenize_bpe" -> bpeTokenizeOracle(10),
    "tokenize_bpe_bytes" -> bpeBytesTokenizeOracle(10),
    "tokenize_bpe_bytes_incremental" -> bpeBytesIncrementalOracle(10),
    "tokenize_bpe_incremental" -> bpeIncrementalOracle(10),
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |        [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS g2,
        |        CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |          for i in range(1, len(w) - 1)])) AS BIGINT) AS d3
        |      FROM t WHERE len(w) >= 3),
        |c AS (SELECT doc_id, n_tokens, d3, count(*) AS cnt
        |      FROM (SELECT doc_id, n_tokens, d3, unnest(g2) AS g FROM s)
        |      GROUP BY doc_id, n_tokens, d3, g),
        |m AS (SELECT doc_id, n_tokens, d3, max(cnt) AS top2
        |      FROM c GROUP BY 1, 2, 3)
        |SELECT doc_id, n_tokens,
        |  (top2 * 20000 + (n_tokens - 1)) // (2 * (n_tokens - 1)) AS top_2gram_bp,
        |  ((n_tokens - 2 - d3) * 20000 + (n_tokens - 2)) // (2 * (n_tokens - 2)) AS dup_3gram_bp
        |FROM m ORDER BY doc_id""".stripMargin,
    // same planted-PII construction, then RE2/Java-portable regex classes;
    // redaction order email -> phone -> ip on both sides
    "text_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@mail.example'
        |      || CASE WHEN doc_id % 3 = 0
        |              THEN ' alt doc' || CAST(doc_id AS VARCHAR) || '@alt.example'
        |              ELSE '' END
        |      || ' phone 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '10\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9.]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'),
        |    '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')) AS redacted_key
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}
