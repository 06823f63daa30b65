package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingSessions

/** Cross-domain oracle fragments + harness helpers shared by the
  * per-domain registries (split from SparkEntry, r14).
  */
private[graft] object RegistryShared {

  /** Run a persisted-artifact replay in a fresh temp root and CLEAN IT UP:
    * the gate result is bounded (tens of rows), so it is materialized
    * eagerly (`localCheckpoint`) before the parquet artifact chain under
    * the root is deleted — otherwise every oracle compare and bench
    * repetition leaks a full v0..vN + checkpoint + input split into /tmp.
    */
  private[graft] def withTempReplayRoot(prefix: String)
                                (f: java.nio.file.Path => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    try f(root).localCheckpoint()
    finally StreamingSessions.deleteRecursively(root)
  }


  /** Shared language-ID CTE chain → `lang(doc_id, pred_lang, c_*)`.
    * Used by `text_langid` and `sample_stratified`.
    */
  private[graft] val langCtes: String =
    """lt AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ls AS (SELECT doc_id,
      |  len(list_filter(w, x -> x IN ('the', 'a'))) AS c_en,
      |  len(list_filter(w, x -> x IN ('data', 'query'))) AS c_es,
      |  len(list_filter(w, x -> x IN ('window', 'batch'))) AS c_de,
      |  len(list_filter(w, x -> x IN ('merge', 'join'))) AS c_fr,
      |  len(list_filter(w, x -> x IN ('hash', 'scan'))) AS c_zh
      |FROM lt),
      |lang AS (SELECT doc_id,
      |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
      |       WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es'
      |       WHEN c_de >= c_fr AND c_de >= c_zh THEN 'de'
      |       WHEN c_fr >= c_zh THEN 'fr'
      |       ELSE 'zh' END AS pred_lang,
      |  c_en, c_es, c_de, c_fr, c_zh
      |FROM ls)""".stripMargin


  /** Shared near-dup cluster CTE chain (word-3-gram Jaccard ≥ ½ pairs →
    * symmetric edges → recursive transitive closure). Used by
    * `dedup_clusters` and the `pipeline_clean_corpus` funnel.
    */
  private[graft] val clusterCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id,
      |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                        for i in range(1, len(w) - 1)]) AS s
      |       FROM t WHERE len(w) >= 3),
      |p AS MATERIALIZED (SELECT a.doc_id AS u, b.doc_id AS v
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 2 * len(list_intersect(a.s, b.s))
      |            >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      |e AS MATERIALIZED (SELECT u, v FROM p UNION SELECT v, u FROM p),
      |reach(a, b) AS (
      |  SELECT u, v FROM e
      |  UNION
      |  SELECT r.a, e.v FROM reach r JOIN e ON r.b = e.u)""".stripMargin

}
