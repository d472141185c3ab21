package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column aliases MUST match between the
  * two — the driver's comparator sorts columns by name before hashing.
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpRegistry {
  import graft.operators._

  /** DuckDB INLINES every CTE reference, so an oracle built from a deep
    * shared CTE chain (the unrolled Lloyd / BPE / unigram fit replays)
    * re-evaluates the whole chain once per reference — measured 475 s
    * on the IVF-balance replay and 360 s on the BPE mix oracle at
    * sf0.01 before this. Rewriting every plain `name AS (` CTE head to
    * `AS MATERIALIZED` makes each CTE evaluate once, bit-identically.
    * Queries carrying a WINDOW clause or a recursive CTE are left
    * untouched — the same token appears there in positions where
    * MATERIALIZED is invalid, and none of those oracles are
    * chain-shaped.
    *
    * Failure-mode notes for a future author: (a) an oracle that adds a
    * named WINDOW clause silently opts out of the rewrite — a perf
    * regression only, never a wrong answer; (b) a VARCHAR literal
    * containing the substring " AS (" would be corrupted — but any
    * such corruption changes the oracle's RESULT and the hash gate
    * fails loudly, so it cannot ship silently. Authoring MATERIALIZED
    * in the SQL directly (the MlOps balance replay does) also works
    * and is preferred for new deep chains. */
  private def materialized(sql: String): String =
    if (sql.contains("RECURSIVE") || sql.contains("WINDOW ")) sql
    else sql.replace(" AS (", " AS MATERIALIZED (")

  private def op(name: String, fn: (SparkSession, String) => DataFrame, sql: String): Op =
    Op(name, fn, Some(materialized(sql.stripMargin.trim)))
  private def opNoOracle(name: String, fn: (SparkSession, String) => DataFrame): Op =
    Op(name, fn, None)

  // ---------------------------------------------------------------- //
  // Relational operator surface (SURVEY §2 mapping targets + Spark    //
  // capabilities the rebuild exposes as first-class operators).       //
  // ---------------------------------------------------------------- //
  private val relational: Seq[Op] = Seq(
    op("q1_agg", RelationalOps.q1Agg,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus"""),
    op("q3_topk_join", RelationalOps.q3TopkJoin,
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10"""),
    op("q5_multijoin", RelationalOps.q5MultiJoin,
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name"""),
    op("q_window", RelationalOps.qWindow,
      """SELECT o_custkey, rn, o_orderkey, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn"""),
    op("q_window_frames", RelationalOps.qWindowFrames,
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(lag(o_totalprice) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS prev_price,
        |  CAST(CAST(lead(o_totalprice) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS next_price,
        |  CAST(CAST(first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DECIMAL(18,2)) AS DOUBLE) AS first_price,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DECIMAL(18,2)) AS DOUBLE) AS neighborhood_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey"""),
    op("q_full_outer", RelationalOps.qFullOuter,
      """WITH c AS (SELECT c_custkey AS k, CAST(1 AS BIGINT) AS is_cust
        |           FROM customer WHERE c_mktsegment = 'MACHINERY'),
        |o AS (SELECT o_custkey AS k, count(*) AS n_urgent
        |      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT coalesce(c.k, o.k) AS k,
        |  coalesce(is_cust, 0) AS is_cust,
        |  coalesce(n_urgent, 0) AS n_urgent
        |FROM c FULL OUTER JOIN o ON c.k = o.k
        |ORDER BY k"""),
    op("q_sort_limit", RelationalOps.qSortLimit,
      """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders
        |ORDER BY total DESC, o_orderkey
        |LIMIT 10"""),
    op("q_intersect", RelationalOps.qIntersect,
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey"""),
    op("q_except", RelationalOps.qExcept,
      """SELECT o_orderkey AS okey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS okey FROM lineitem
        |ORDER BY okey"""),
    op("q_semi_join", RelationalOps.qSemiJoin,
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey"""),
    op("q_anti_join", RelationalOps.qAntiJoin,
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey"""),
    op("q_scalar_funcs", RelationalOps.qScalarFuncs,
      """SELECT p_partkey,
        |  upper(p_type) AS type_up,
        |  substr(p_name, 1, 8) AS name_pfx,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(CAST(round(p_retailprice*0.8, 2) AS DECIMAL(18,2)) AS DOUBLE) AS discounted,
        |  CASE WHEN p_size >= 25 THEN 'large'
        |       WHEN p_size >= 10 THEN 'medium'
        |       ELSE 'small' END AS size_class
        |FROM part
        |ORDER BY p_partkey"""),
    op("q_date_funcs", RelationalOps.qDateFuncs,
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY yr, mo"""),
    op("q_distinct_agg", RelationalOps.qDistinctAgg,
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag"""),
    op("q_having", RelationalOps.qHaving,
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 8
        |ORDER BY o_custkey"""),
    op("q_rollup", RelationalOps.qRollup,
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls"""),
    op("q_cube", RelationalOps.qCube,
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls"""),
    op("q_grouping_sets", RelationalOps.qGroupingSets, RelationalOps.qGroupingSetsSql),
    op("q_salted_join", RelationalOps.qSaltedJoin,
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    op("q_bucketed_join", RelationalOps.qBucketedJoin, RelationalOps.qBucketedJoinSql),
    // round 12 (verdict #6): the sketch estimate itself stays
    // engine-specific, but the row is now fully oracled — the op emits
    // the exact count plus an in-Spark hll_ok flag (estimate within
    // 3×rsd), so DuckDB value-compares the contract instead of the
    // sketch. PipelineSpec pins the same envelope.
    op("q_approx_percentile",
      RelationalOps.qApproxPercentile, RelationalOps.qApproxPercentileSql),
    op("q_approx_distinct", RelationalOps.qApproxDistinct,
      RelationalOps.qApproxDistinctSql),
    op("q_range_join", RelationalOps.qRangeJoin, RelationalOps.qRangeJoinSql),
    op("q_merge_upsert", RelationalOps.qMergeUpsert, RelationalOps.qMergeUpsertSql),
    op("q_range_frames", RelationalOps.qRangeFrames, RelationalOps.qRangeFramesSql),
    op("q_first_last", RelationalOps.qFirstLast, RelationalOps.qFirstLastSql),
    op("q_pivot_multi", RelationalOps.qPivotMulti, RelationalOps.qPivotMultiSql),
    op("q_latest_per_key", RelationalOps.qLatestPerKey, RelationalOps.qLatestPerKeySql),
    op("q_incremental_agg", RelationalOps.qIncrementalAgg, RelationalOps.qIncrementalAggSql),
    op("q_asof_join", RelationalOps.qAsofJoin,
      """WITH ord AS (
        |  SELECT o_custkey AS key, o_orderdate AS t, max(o_orderkey) AS okey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.okey
        |FROM events e ASOF JOIN ord o
        |  ON e.user_id = o.key AND e.ts >= o.t
        |ORDER BY event_id"""),
    op("q_salted_agg", RelationalOps.qSaltedAgg,
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    op("q_pivot", RelationalOps.qPivot,
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_f,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    op("q_unpivot", RelationalOps.qUnpivot, RelationalOps.qUnpivotSql),
    op("q_rank_family", RelationalOps.qRankFamily, RelationalOps.qRankFamilySql),
    op("q_string_agg", RelationalOps.qStringAgg,
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name"""),
    op("q_scalar_subquery", RelationalOps.qScalarSubquery,
      """SELECT c_custkey,
        |  (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer ORDER BY c_custkey"""),
    op("q_null_handling", RelationalOps.qNullHandling,
      """SELECT l_returnflag,
        |  count(nullif(CAST(l_discount AS DECIMAL(18,2)), 0)) AS n_nonnull,
        |  count(*) AS n_all,
        |  CAST(coalesce(min(nullif(CAST(l_discount AS DECIMAL(18,2)), 0)), -1) AS DOUBLE) AS min_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    op("q_cross_join", RelationalOps.qCrossJoin,
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name"""),
    op("q_percentile", RelationalOps.qPercentile,
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.5) AS p50,
        |  quantile_disc(l_extendedprice, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  // ---------------------------------------------------------------- //
  // RDF parity surface (SURVEY §2.1-2.3) on the testdata triple view. //
  // ---------------------------------------------------------------- //
  private val rdfParity: Seq[Op] = Seq(
    op("rdf_ap_spo", RdfOps.apSpo, RdfOps.apSpoSql),
    op("rdf_ap_po", RdfOps.apPo, RdfOps.apPoSql),
    op("rdf_ap_so", RdfOps.apSo, RdfOps.apSoSql),
    op("rdf_ap_sp", RdfOps.apSp, RdfOps.apSpSql),
    op("rdf_ap_o", RdfOps.apO, RdfOps.apOSql),
    op("rdf_ap_p", RdfOps.apP, RdfOps.apPSql),
    op("rdf_ap_s", RdfOps.apS, RdfOps.apSSql),
    op("rdf_ap_full", RdfOps.apFull, RdfOps.apFullSql),
    op("rdf_bgp_join", RdfOps.bgpJoin, RdfOps.bgpJoinSql),
    op("rdf_bgp_optional", RdfOps.bgpOptional, RdfOps.bgpOptionalSql),
    op("rdf_bgp_union", RdfOps.bgpUnion, RdfOps.bgpUnionSql),
    op("rdf_bgp_filter", RdfOps.bgpFilter, RdfOps.bgpFilterSql),
    op("rdf_bgp_filter_num", RdfOps.bgpFilterNum, RdfOps.bgpFilterNumSql),
    op("rdf_bgp_filter_varvar", RdfOps.bgpFilterVarVar, RdfOps.bgpFilterVarVarSql),
    op("rdf_bgp_filter_bool", RdfOps.bgpFilterBool, RdfOps.bgpFilterBoolSql),
    op("rdf_bgp_filter_bound", RdfOps.bgpFilterBound, RdfOps.bgpFilterBoundSql),
    op("rdf_bgp_filter_strfns", RdfOps.bgpFilterStrFns, RdfOps.bgpFilterStrFnsSql),
    op("rdf_bgp_filter_isiri", RdfOps.bgpFilterIsiri, RdfOps.bgpFilterIsiriSql),
    op("rdf_bgp_filter_lang", RdfOps.bgpFilterLang, RdfOps.bgpFilterLangSql),
    op("rdf_bgp_filter_str_in", RdfOps.bgpFilterStrIn, RdfOps.bgpFilterStrInSql),
    op("rdf_bgp_bind_coalesce", RdfOps.bgpBindCoalesce, RdfOps.bgpBindCoalesceSql),
    op("rdf_bgp_str_funcs", RdfOps.bgpStrFuncs, RdfOps.bgpStrFuncsSql),
    op("rdf_bgp_bind_arith", RdfOps.bgpBindArith, RdfOps.bgpBindArithSql),
    op("rdf_bgp_bind_strops", RdfOps.bgpBindStrops, RdfOps.bgpBindStropsSql),
    op("rdf_bgp_filter_langmatches",
      RdfOps.bgpFilterLangMatches, RdfOps.bgpFilterLangMatchesSql),
    op("rdf_bgp_bind_numeric", RdfOps.bgpBindNumeric, RdfOps.bgpBindNumericSql),
    op("rdf_bgp_bind_hash", RdfOps.bgpBindHash, RdfOps.bgpBindHashSql),
    op("rdf_bgp_bind_datetime", RdfOps.bgpBindDatetime, RdfOps.bgpBindDatetimeSql),
    op("rdf_bgp_filter_sameterm",
      RdfOps.bgpFilterSameterm, RdfOps.bgpFilterSametermSql),
    op("rdf_bgp_bind_terms", RdfOps.bgpBindTerms, RdfOps.bgpBindTermsSql),
    op("rdf_bgp_order_limit", RdfOps.bgpOrderLimit, RdfOps.bgpOrderLimitSql),
    op("rdf_bgp_group_count", RdfOps.bgpGroupCount, RdfOps.bgpGroupCountSql),
    op("rdf_bgp_group_having", RdfOps.bgpGroupHaving, RdfOps.bgpGroupHavingSql),
    op("rdf_bgp_group_having_band",
      RdfOps.bgpGroupHavingBand, RdfOps.bgpGroupHavingBandSql),
    op("rdf_bgp_group_mixed", RdfOps.bgpGroupMixed, RdfOps.bgpGroupMixedSql),
    op("rdf_bgp_group_concat", RdfOps.bgpGroupConcat, RdfOps.bgpGroupConcatSql),
    op("rdf_bgp_group_topk", RdfOps.bgpGroupTopk, RdfOps.bgpGroupTopkSql),
    op("rdf_bgp_subquery", RdfOps.bgpSubquery, RdfOps.bgpSubquerySql),
    op("rdf_bgp_values", RdfOps.bgpValues, RdfOps.bgpValuesSql),
    op("rdf_bgp_values_multi", RdfOps.bgpValuesMulti, RdfOps.bgpValuesMultiSql),
    op("rdf_bgp_values_undef", RdfOps.bgpValuesUndef, RdfOps.bgpValuesUndefSql),
    op("rdf_bgp_minus", RdfOps.bgpMinus, RdfOps.bgpMinusSql),
    op("rdf_bgp_exists", RdfOps.bgpExists, RdfOps.bgpExistsSql),
    op("rdf_bgp_bind", RdfOps.bgpBind, RdfOps.bgpBindSql),
    op("rdf_bgp_path_opt", RdfOps.bgpPathOpt, RdfOps.bgpPathOptSql),
    op("rdf_ask", RdfOps.bgpAsk, RdfOps.bgpAskSql),
    op("rdf_construct", RdfOps.bgpConstruct, RdfOps.bgpConstructSql),
    op("rdf_describe", RdfOps.bgpDescribe, RdfOps.bgpDescribeSql),
    op("rdf_bgp_path_seq", RdfOps.bgpPathSeq, RdfOps.bgpPathSeqSql),
    op("rdf_bgp_path_trans", RdfOps.bgpPathTrans, RdfOps.bgpPathTransSql),
    op("rdf_bgp_path_bound", RdfOps.bgpPathBound, RdfOps.bgpPathBoundSql),
    op("rdf_bgp_path_seq_trans", RdfOps.bgpPathSeqTrans, RdfOps.bgpPathSeqTransSql),
    op("rdf_bgp_path_star", RdfOps.bgpPathStar, RdfOps.bgpPathStarSql),
    op("rdf_bgp_path_inv", RdfOps.bgpPathInv, RdfOps.bgpPathInvSql),
    op("rdf_bgp_path_alt", RdfOps.bgpPathAlt, RdfOps.bgpPathAltSql),
    op("rdf_bgp_path_negset", RdfOps.bgpPathNegset, RdfOps.bgpPathNegsetSql),
    op("rdf_bgp_path_quant", RdfOps.bgpPathQuant, RdfOps.bgpPathQuantSql),
    op("rdf_bgp_agg_expr", RdfOps.bgpAggExpr, RdfOps.bgpAggExprSql),
    op("rdf_bgp_filter_exists_expr",
      RdfOps.bgpFilterExistsExpr, RdfOps.bgpFilterExistsExprSql),
    op("rdf_bgp_typed", RdfOps.bgpTyped, RdfOps.bgpTypedSql),
    op("rdf_graph_bound", RdfOps.graphBound, RdfOps.graphBoundSql),
    op("rdf_graph_var", RdfOps.graphVar, RdfOps.graphVarSql),
    op("rdf_graph_join", RdfOps.graphJoin, RdfOps.graphJoinSql),
    op("rdf_graph_dataset", RdfOps.graphDataset, RdfOps.graphDatasetSql),
    op("rdf_insert", RdfOps.insert, RdfOps.insertSql),
    op("rdf_remove", RdfOps.remove, RdfOps.removeSql),
    op("rdf_remove_pattern", RdfOps.removePattern, RdfOps.removePatternSql),
    op("rdf_update", RdfOps.updateOps, RdfOps.updateOpsSql),
    op("rdf_update_graphs", RdfOps.updateGraphs, RdfOps.updateGraphsSql),
    op("rdf_dict_encode", RdfOps.dictEncode, RdfOps.dictEncodeSql),
    op("rdf_persist_roundtrip", RdfOps.persistRoundtrip, RdfOps.persistRoundtripSql),
  )

  // ---------------------------------------------------------------- //
  // LLM-data-pipeline extensions (dedup, similarity, text, multimodal)//
  // + events/streaming + GraphX analytics (BASELINE.json north star). //
  // ---------------------------------------------------------------- //
  private val pipeline: Seq[Op] = Seq(
    op("text_stats", TextOps.textStats, TextOps.textStatsSql),
    op("text_quality", TextOps.textQuality, TextOps.textQualitySql),
    op("text_langid", TextOps.textLangId, TextOps.textLangIdSql),
    op("text_fingerprint", TextOps.textFingerprint, TextOps.textFingerprintSql),
    op("text_simhash", TextOps.textSimhash, TextOps.textSimhashSql),
    op("text_top_tokens", TextOps.textTopTokens, TextOps.textTopTokensSql),
    op("text_tokens_bpe", TextOps.textTokensBpe, TextOps.textTokensBpeSql),
    op("text_repetition", TextOps.textRepetition, TextOps.textRepetitionSql),
    op("text_repetition_remove", TextOps.textRepetitionRemove, TextOps.textRepetitionRemoveSql),
    op("text_span_scrub", TextOps.textSpanScrub, TextOps.textSpanScrubSql),
    op("text_bpe_train", TextOps.textBpeTrain, TextOps.textBpeTrainSql),
    op("text_bpe_encode", TextOps.textBpeEncode, TextOps.textBpeEncodeSql),
    op("text_unigram_train", TextOps.textUnigramTrain, TextOps.textUnigramTrainSql),
    op("text_unigram_encode", TextOps.textUnigramEncode, TextOps.textUnigramEncodeSql),
    op("text_tokenizer_fertility",
      TextOps.textTokenizerFertility, TextOps.textTokenizerFertilitySql),
    op("text_stream_unigram",
      TextOps.textStreamUnigram, TextOps.textUnigramEncodeSql),
    op("text_pii", TextOps.textPii, TextOps.textPiiSql),
    op("text_simhash_by_source", TextOps.textSimhashBySource, TextOps.textSimhashBySourceSql),
    op("text_dup_ratio", TextOps.textDupRatio, TextOps.textDupRatioSql),
    op("text_gopher_rules", TextOps.textGopherRules, TextOps.textGopherRulesSql),
    op("text_bpe_pairs", TextOps.textBpePairs, TextOps.textBpePairsSql),
    op("doc_tfidf_topk", TextOps.docTfidfTopk, TextOps.docTfidfTopkSql),
    op("text_ngram_lm", TextOps.textNgramLm, TextOps.textNgramLmSql),
    op("text_ppl_bucket", TextOps.textPplBucket, TextOps.textPplBucketSql),
    op("text_lm_coverage", TextOps.textLmCoverage, TextOps.textLmCoverageSql),
    op("text_encode_ids", TextOps.textEncodeIds, TextOps.textEncodeIdsSql),
    op("text_hash_features", TextOps.textHashFeatures, TextOps.textHashFeaturesSql),
    op("text_eval_overlap", TextOps.textEvalOverlap, TextOps.textEvalOverlapSql),
    op("text_ngram_novelty", TextOps.textNgramNovelty, TextOps.textNgramNoveltySql),
    op("text_vocab_growth", TextOps.textVocabGrowth, TextOps.textVocabGrowthSql),
    op("text_winnowing", TextOps.textWinnowing, TextOps.textWinnowingSql),
    op("text_lang_mix", TextOps.textLangMix, TextOps.textLangMixSql),
    op("dedup_winnow", DedupOps.dedupWinnow, DedupOps.dedupWinnowSql),
    op("dedup_exact", DedupOps.dedupExact, DedupOps.dedupExactSql),
    op("dedup_prefix", DedupOps.dedupPrefix, DedupOps.dedupPrefixSql),
    op("dedup_report", DedupOps.dedupReport, DedupOps.dedupReportSql),
    op("dedup_incremental", DedupOps.dedupIncremental, DedupOps.dedupIncrementalSql),
    op("dedup_stream_incremental", DedupOps.dedupStreamIncremental, DedupOps.dedupStreamIncrementalSql),
    op("dedup_span", DedupOps.dedupSpan, DedupOps.dedupSpanSql),
    op("dedup_norm", DedupOps.dedupNorm, DedupOps.dedupNormSql),
    op("dedup_ngram_jaccard", DedupOps.dedupNgramJaccard, DedupOps.dedupNgramJaccardSql),
    op("dedup_containment", DedupOps.dedupContainment, DedupOps.dedupContainmentSql),
    op("dedup_cross_source", DedupOps.dedupCrossSource, DedupOps.dedupCrossSourceSql),
    op("dedup_clusters", DedupOps.dedupClusters, DedupOps.dedupClustersSql),
    op("dedup_embedding_clusters",
      DedupOps.dedupEmbeddingClusters, DedupOps.dedupEmbeddingClustersSql),
    op("dedup_minhash_lsh", DedupOps.dedupMinhashLsh, DedupOps.dedupMinhashLshSql),
    op("dedup_lsh_curve", DedupOps.dedupLshCurve, DedupOps.dedupLshCurveSql),
    op("dedup_simhash_curve",
      DedupOps.dedupSimhashCurve, DedupOps.dedupSimhashCurveSql),
    op("dedup_simhash", DedupOps.dedupSimhash, DedupOps.dedupSimhashSql),
    op("dedup_embedding_cosine", DedupOps.dedupEmbeddingCosine, DedupOps.dedupEmbeddingCosineSql),
    op("dedup_embedding_lsh", DedupOps.dedupEmbeddingLsh, DedupOps.dedupEmbeddingLshSql),
    op("doc_quality_filter", CurationOps.docQualityFilter, CurationOps.docQualityFilterSql),
    op("doc_sample_stratified", CurationOps.docSampleStratified, CurationOps.docSampleStratifiedSql),
    op("dedup_decontaminate", CurationOps.dedupDecontaminate, CurationOps.dedupDecontaminateSql),
    op("text_redact", CurationOps.textRedact, CurationOps.textRedactSql),
    op("doc_stream_quality", CurationOps.docStreamQuality, CurationOps.docStreamQualitySql),
    op("doc_shard_pack", CurationOps.docShardPack, CurationOps.docShardPackSql),
    op("doc_pack_manifest",
      CurationOps.docPackManifest, CurationOps.docPackManifestSql),
    op("doc_pack_manifest_bpe",
      CurationOps.docPackManifestBpe, CurationOps.docPackManifestBpeSql),
    op("doc_interleave", CurationOps.docInterleave, CurationOps.docInterleaveSql),
    op("doc_mix_weights", CurationOps.docMixWeights, CurationOps.docMixWeightsSql),
    op("doc_mix_temperature",
      CurationOps.docMixTemperature, CurationOps.docMixTemperatureSql),
    op("doc_mix_epochs", CurationOps.docMixEpochs, CurationOps.docMixEpochsSql),
    op("doc_curriculum", CurationOps.docCurriculum, CurationOps.docCurriculumSql),
    op("doc_interleave_epochs",
      CurationOps.docInterleaveEpochs, CurationOps.docInterleaveEpochsSql),
    op("ev_lateness_profile",
      EventOps.evLatenessProfile, EventOps.evLatenessProfileSql),
    op("doc_interleave_temperature",
      CurationOps.docInterleaveTemperature, CurationOps.docInterleaveTemperatureSql),
    op("doc_global_shuffle", CurationOps.docGlobalShuffle, CurationOps.docGlobalShuffleSql),
    op("doc_quality_rank", CurationOps.docQualityRank, CurationOps.docQualityRankSql),
    op("doc_quality_nb", CurationOps.docQualityNb, CurationOps.docQualityNbSql),
    op("doc_quality_nb_eval",
      CurationOps.docQualityNbEval, CurationOps.docQualityNbEvalSql),
    op("doc_quality_nb_calibration",
      CurationOps.docQualityNbCalibration, CurationOps.docQualityNbCalibrationSql),
    op("doc_dsir_select", CurationOps.docDsirSelect, CurationOps.docDsirSelectSql),
    op("doc_stream_quality_nb",
      CurationOps.docStreamQualityNb, CurationOps.docStreamQualityNbSql),
    op("doc_pack_efficiency",
      CurationOps.docPackEfficiency, CurationOps.docPackEfficiencySql),
    op("doc_token_budget", CurationOps.docTokenBudget, CurationOps.docTokenBudgetSql),
    op("doc_length_histogram",
      CurationOps.docLengthHistogram, CurationOps.docLengthHistogramSql),
    op("doc_chunk", CurationOps.docChunk, CurationOps.docChunkSql),
    op("doc_rag_e2e", CurationOps.docRagE2e, CurationOps.docRagE2eSql),
    op("doc_rag_recall", CurationOps.docRagRecall, CurationOps.docRagRecallSql),
    op("doc_rag_mmr", CurationOps.docRagMmr, CurationOps.docRagMmrSql),
    op("doc_rag_mmr_recall",
      CurationOps.docRagMmrRecall, CurationOps.docRagMmrRecallSql),
    op("doc_rag_index", CurationOps.docRagIndex, CurationOps.docRagIndexSql),
    op("doc_rag_index_append", CurationOps.docRagIndexAppend, CurationOps.docRagIndexAppendSql),
    op("doc_rag_stream", CurationOps.docRagStream, CurationOps.docRagStreamSql),
    op("doc_train_feed_e2e", CurationOps.docTrainFeed, CurationOps.docTrainFeedSql),
    op("doc_train_feed_bpe", CurationOps.docTrainFeedBpe, CurationOps.docTrainFeedBpeSql),
    op("doc_token_budget_bpe", CurationOps.docTokenBudgetBpe, CurationOps.docTokenBudgetBpeSql),
    op("doc_mix_weights_bpe", CurationOps.docMixWeightsBpe, CurationOps.docMixWeightsBpeSql),
    op("doc_pipeline_e2e", CurationOps.docPipelineE2e, CurationOps.docPipelineE2eSql),
    op("doc_ccnet_e2e", CurationOps.docCcnetE2e, CurationOps.docCcnetE2eSql),
    op("doc_partitioned_sink",
      CurationOps.docPartitionedSink, CurationOps.docPartitionedSinkSql),
    op("doc_compact_sink",
      CurationOps.docCompactSink, CurationOps.docCompactSinkSql),
    op("sim_topk_brute", SimilarityOps.simTopkBrute, SimilarityOps.simTopkBruteSql),
    op("sim_hard_negatives",
      SimilarityOps.simHardNegatives, SimilarityOps.simHardNegativesSql),
    op("sim_ann_lsh", SimilarityOps.simAnnLsh, SimilarityOps.simAnnLshSql),
    op("sim_knn_graph", SimilarityOps.simKnnGraph, SimilarityOps.simKnnGraphSql),
    op("sim_vector_stats",
      SimilarityOps.simVectorStats, SimilarityOps.simVectorStatsSql),
    // DECISION (round 9, from round-8 verdict #4, superseding the
    // round-8 decision): dedup_minhash_ml is UNREGISTERED — MLlib
    // MinHashLSH model internals can never hash-match an external
    // engine, so the op lives as a spec-only cross-check (MlOpsSpec
    // pins rows + recall against the oracle-green dedup_minhash_lsh)
    // instead of reading as a permanent correctness hole here. The
    // IVF pair is now deterministic (IvfKmeans: md5 seeds + fixed
    // quantized Lloyd rounds) and fully hash-checked.
    op("sim_ann_ivf", MlOps.simAnnIvf, MlOps.ivfOracleSql),
    op("sim_ann_ivf_index", MlOps.simAnnIvfIndex, MlOps.ivfOracleSql),
    op("sim_ann_pq", MlOps.simAnnPq, MlOps.pqOracleSql),
    op("sim_ann_ivf_pq", MlOps.simAnnIvfPq, MlOps.ivfPqOracleSql),
    op("doc_rag_hybrid", CurationOps.docRagHybrid, CurationOps.docRagHybridSql),
    op("doc_rag_index_compact",
      CurationOps.docRagIndexCompact, CurationOps.docRagIndexCompactSql),
    op("doc_rag_stream_append",
      CurationOps.docRagStreamAppend, CurationOps.docRagStreamAppendSql),
    op("doc_rag_index_delete",
      CurationOps.docRagIndexDelete, CurationOps.docRagIndexDeleteSql),
    op("doc_rag_refit", CurationOps.docRagRefit, CurationOps.docRagRefitSql),
    op("doc_rag_hybrid_recall",
      CurationOps.docRagHybridRecall, CurationOps.docRagHybridRecallSql),
    op("doc_rag_prf", CurationOps.docRagPrf, CurationOps.docRagPrfSql),
    op("doc_rag_prf_recall",
      CurationOps.docRagPrfRecall, CurationOps.docRagPrfRecallSql),
    op("doc_rag_filtered",
      CurationOps.docRagFiltered, CurationOps.docRagFilteredSql),
    op("doc_rag_index_filtered",
      CurationOps.docRagIndexFiltered, CurationOps.docRagIndexFilteredSql),
    op("doc_rag_filtered_recall",
      CurationOps.docRagFilteredRecall, CurationOps.docRagFilteredRecallSql),
    op("dedup_incremental_bloom",
      DedupOps.dedupIncrementalBloom, DedupOps.dedupIncrementalBloomSql),
    op("dedup_near_incremental",
      DedupOps.dedupNearIncremental, DedupOps.dedupNearIncrementalSql),
    op("dedup_stream_near",
      DedupOps.dedupStreamNear, DedupOps.dedupStreamNearSql),
    op("sim_cluster_sample", MlOps.simClusterSample, MlOps.clusterSampleSql),
    op("sim_ann_recall", MlOps.simAnnRecall, MlOps.simAnnRecallSql),
    op("sim_ann_ivf_pq_recall",
      MlOps.simAnnIvfPqRecall, MlOps.simAnnIvfPqRecallSql),
    op("sim_ann_sq8", MlOps.simAnnSq8, MlOps.sq8OracleSql),
    op("sim_ann_sq8_recall", MlOps.simAnnSq8Recall, MlOps.simAnnSq8RecallSql),
    op("sim_ann_report", MlOps.simAnnReport, MlOps.simAnnReportSql),
    op("sim_ann_ivf_balance", MlOps.simAnnIvfBalance, MlOps.ivfBalanceSql),
    op("sim_ann_probe_sweep", MlOps.simAnnProbeSweep, MlOps.simAnnProbeSweepSql),
    op("sim_ann_filtered", MlOps.simAnnFiltered, MlOps.simAnnFilteredSql),
    op("sim_ann_filtered_recall",
      MlOps.simAnnFilteredRecall, MlOps.simAnnFilteredRecallSql),
    op("sim_ann_filtered_sweep",
      MlOps.simAnnFilteredSweep, MlOps.simAnnFilteredSweepSql),
    op("sim_ann_balance_probe",
      MlOps.simAnnBalanceProbe, MlOps.simAnnBalanceProbeSql),
    op("mm_stream_ingest",
      MultimodalOps.mmStreamIngest, MultimodalOps.mmStreamIngestSql),
    op("mm_metadata", MultimodalOps.mmMetadata, MultimodalOps.mmMetadataSql),
    op("mm_frame_sample", MultimodalOps.mmFrameSample, MultimodalOps.mmFrameSampleSql),
    op("mm_feature", MultimodalOps.mmFeature, MultimodalOps.mmFeatureSql),
    op("mm_resize", MultimodalOps.mmResize, MultimodalOps.mmResizeSql),
    op("mm_dedup_exact", MultimodalOps.mmDedupExact, MultimodalOps.mmDedupExactSql),
    op("mm_shard_pack", MultimodalOps.mmShardPack, MultimodalOps.mmShardPackSql),
    op("mm_dedup_near", MultimodalOps.mmDedupNear, MultimodalOps.mmDedupNearSql),
    op("mm_pipeline_e2e", MultimodalOps.mmPipelineE2e, MultimodalOps.mmPipelineE2eSql),
    op("doc_jsonl_roundtrip", graft.sources.DocSourceOps.jsonlRoundtrip,
      graft.sources.DocSourceOps.fingerprintSql),
    op("doc_csv_roundtrip", graft.sources.DocSourceOps.csvRoundtrip,
      graft.sources.DocSourceOps.fingerprintSql),
    op("doc_orc_roundtrip", graft.sources.DocSourceOps.orcRoundtrip,
      graft.sources.DocSourceOps.fingerprintSql),
    op("ev_window_agg", EventOps.evWindowAgg, EventOps.evWindowAggSql),
    op("ev_json", EventOps.evJson, EventOps.evJsonSql),
    op("ev_sessionize", EventOps.evSessionize, EventOps.evSessionizeSql),
    op("ev_stream_window", EventOps.evStreamWindow, EventOps.evWindowAggSql),
    op("ev_stream_sessionize", EventOps.evStreamSessionize, EventOps.evSessionizeSql),
    op("ev_stream_enrich", EventOps.evStreamEnrich, EventOps.evStreamEnrichSql),
    op("ev_stream_stream_join", EventOps.evStreamStreamJoin, EventOps.evStreamStreamJoinSql),
    op("ev_stream_dedup", EventOps.evStreamDedup, EventOps.evStreamDedupSql),
    op("ev_session_window", EventOps.evSessionWindow, EventOps.evSessionWindowSql),
    op("ev_stream_session_window", EventOps.evStreamSessionWindow, EventOps.evSessionWindowSql),
    op("ev_stream_to_parquet", EventOps.evStreamToParquet, EventOps.evStreamToParquetSql),
    op("ev_funnel", EventOps.evFunnel, EventOps.evFunnelSql),
    op("ev_retention", EventOps.evRetention, EventOps.evRetentionSql),
    op("ev_scd2", EventOps.evScd2, EventOps.evScd2Sql),
    op("ev_stream_scd2", EventOps.evStreamScd2, EventOps.evStreamScd2Sql),
    op("ev_hop_window", EventOps.evHopWindow, EventOps.evHopWindowSql),
    op("ev_stream_hop_window", EventOps.evStreamHopWindow, EventOps.evStreamHopWindowSql),
    op("ev_gap_stats", EventOps.evGapStats, EventOps.evGapStatsSql),
    op("ev_anomaly", EventOps.evAnomaly, EventOps.evAnomalySql),
    op("ev_stream_anomaly", EventOps.evStreamAnomaly, EventOps.evStreamAnomalySql),
    op("ev_top_k_per_window", EventOps.evTopKPerWindow, EventOps.evTopKPerWindowSql),
    op("ev_rate_fill", EventOps.evRateFill, EventOps.evRateFillSql),
    op("ev_user_lifetime", EventOps.evUserLifetime, EventOps.evUserLifetimeSql),
    op("ev_burst_detect", EventOps.evBurstDetect, EventOps.evBurstDetectSql),
    op("ev_stream_top_k", EventOps.evStreamTopK, EventOps.evTopKPerWindowSql),
    op("ev_cooccurrence", EventOps.evCooccurrence, EventOps.evCooccurrenceSql),
    op("ev_transitions", EventOps.evTransitions, EventOps.evTransitionsSql),
    op("ev_time_to_convert", EventOps.evTimeToConvert, EventOps.evTimeToConvertSql),
    op("ev_churn_cohort", EventOps.evChurnCohort, EventOps.evChurnCohortSql),
    op("ev_active_users", EventOps.evActiveUsers, EventOps.evActiveUsersSql),
    op("rdf_xml_source", RdfXmlOps.xmlSource, RdfXmlOps.xmlOracleSql),
    op("rdf_xml_roundtrip", RdfXmlOps.xmlRoundtrip, RdfXmlOps.xmlOracleSql),
    op("rdf_nt_roundtrip", RdfXmlOps.ntRoundtrip, RdfOps.apFullSql),
    op("rdf_ttl_roundtrip", RdfXmlOps.ttlRoundtrip, RdfOps.apFullSql),
    op("rdf_nq_roundtrip", RdfXmlOps.nqRoundtrip, RdfXmlOps.nqOracleSql),
    op("rdf_trig_roundtrip", RdfXmlOps.trigRoundtrip, RdfXmlOps.nqOracleSql),
    opNoOracle("rdf_footprint", RdfXmlOps.footprint),
    opNoOracle("rdf_build_corpus", RdfXmlOps.buildCorpus),
    op("graphx_degrees", GraphOps.graphxDegrees, GraphOps.graphxDegreesSql),
    op("graphx_cc", GraphOps.graphxCc, GraphOps.graphxCcSql),
    op("graphx_pagerank", GraphOps.graphxPagerank, GraphOps.graphxPagerankSql),
    op("graphx_triangles", GraphOps.graphxTriangles, GraphOps.graphxTrianglesSql),
    op("graphx_sssp", GraphOps.graphxSssp, GraphOps.graphxSsspSql),
    op("graphx_label_prop", GraphOps.graphxLabelProp, GraphOps.graphxLabelPropSql),
  )

  val ops: Seq[Op] = relational ++ rdfParity ++ pipeline

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map(o => o.name -> o.fn).toMap
  def oracleSql: Map[String, String] =
    ops.collect { case Op(n, _, Some(sql)) => n -> sql }.toMap
}
