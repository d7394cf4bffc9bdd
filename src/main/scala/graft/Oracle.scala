package graft

/** DuckDB oracle SQL for every judged query (SURVEY.md Appendix A).
  *
  * Deviations from the Appendix A text, all per the SURVEY §7 hazard-10
  * rule (column names AND types must match the Spark output exactly, and
  * both sides may be adjusted together):
  *  - `join_range_theta`, `join_cross`: duplicate output column names
  *    aliased apart (a_id/b_id, r1_name/r2_name).
  *  - `set_union_all`, `stream_dedup`: bare `count(*)` aliased `c`.
  *  - `stream_session`: windowed `sum(brk)` cast to BIGINT (DuckDB's
  *    integer sum is HUGEINT; Spark's is long).
  *  - `llm_cosine_topk`, `llm_knn_label`: embeddings cast to DOUBLE[]
  *    (DuckDB's list_cosine_similarity over FLOAT[] computes in float;
  *    the Spark side computes in double).
  */
object Oracle {
  /** The pinned-hash MinHash-LSH pair pipeline as a reusable CTE chain
    * (shingle hashes → 16 pinned minhashes → 4×4 banding → candidates →
    * size-pruned exact Jaccard `j`), GENERATED from the same constants
    * the engine uses (ScalableDedup.minhashA/B/MinhashP) so oracle and
    * engine cannot drift. Shared by `dedup_minhash_lsh` (the pair set)
    * and `llm_dedup_clusters` (its transitive closure);
    * `dedup_lsh_capped` replays the deterministic bucket-size cap by
    * passing `cap` (buckets with more than `cap` members are dropped
    * before candidate generation — an exact count, so the window-count
    * filter below reproduces the engine's anti-join bit-for-bit). */
  private val minhashPairCtes: String = minhashCtes(None)

  private def minhashCtes(cap: Option[Int]): String =
    "t AS (SELECT doc_id, list_distinct(list_transform(list_distinct(list_transform(range(1, greatest(len(text) - 3, 1) + 1), i -> substr(text, i::INT, 4))), s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS hs FROM documents), " +
      "h AS (SELECT doc_id, hs, " +
      (0 until 16).map(i =>
        s"list_min(list_transform(hs, x -> (x * ${graft.operators.ScalableDedup.minhashA(i)} + ${graft.operators.ScalableDedup.minhashB(i)}) % ${graft.operators.ScalableDedup.MinhashP})) AS h$i").mkString(", ") +
      " FROM t), " +
      "bands AS (" +
      (0 until 4).map(b => s"SELECT doc_id, $b AS band, h${4 * b}||':'||h${4 * b + 1}||':'||h${4 * b + 2}||':'||h${4 * b + 3} AS sig FROM h").mkString(" UNION ALL ") +
      "), " +
      cap.map(c =>
        "kept AS (SELECT doc_id, band, sig FROM (SELECT doc_id, band, sig, " +
          "count(*) OVER (PARTITION BY band, sig) AS bn FROM bands) " +
          s"WHERE bn <= $c), ").getOrElse("") +
      "cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id " +
      s"FROM ${cap.fold("bands")(_ => "kept")} a " +
      s"JOIN ${cap.fold("bands")(_ => "kept")} b " +
      "ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
      "sized AS (SELECT a_id, b_id, ta.hs AS ha, tb.hs AS hb, len(ta.hs) AS na, len(tb.hs) AS nb " +
      "FROM cand JOIN t ta ON ta.doc_id = a_id JOIN t tb ON tb.doc_id = b_id " +
      "WHERE least(len(ta.hs), len(tb.hs)) * 5 >= greatest(len(ta.hs), len(tb.hs)) * 4), " +
      "j AS (SELECT a_id, b_id, round(CAST(len(list_intersect(ha, hb)) AS DOUBLE) / (na + nb - len(list_intersect(ha, hb))), 6) AS jac FROM sized)"

  /** Exact brute-force cosine top-5 for probes vec_id < 10 — the shared
    * oracle of `ann_ivf_exact` and `ann_pq_rerank_exact` (both engine
    * paths provably degenerate to exact KNN; see graft.operators.Ann /
    * Pq). Self excluded; rank on the raw double, tie-break by id. */
  private val annExactKnnSql: String =
    "SELECT probe_id, nb, sim FROM (" +
      "SELECT a.vec_id AS probe_id, b.vec_id AS nb, " +
      "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim, " +
      "row_number() OVER (PARTITION BY a.vec_id ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rn " +
      "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id " +
      "WHERE a.vec_id < 10) WHERE rn <= 5 ORDER BY probe_id, rn"

  /** The as-of-version-2 SCD-2 state recomputed directly from orders —
    * shared by `source_scd2_asof` (in-memory history) and
    * `source_scd2_pruned` (the effective_to-partitioned dim layout). */
  private val scd2AsofV2Sql: String =
    "SELECT CASE WHEN o_orderkey % 7 = 0 THEN '9-RECLASSIFIED' " +
      "ELSE o_orderpriority END AS o_orderpriority, " +
      "CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(o_orderkey) AS BIGINT) AS key_sum " +
      "FROM orders GROUP BY 1 ORDER BY o_orderpriority"

  val sql: Map[String, String] = Map(
    "scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net_price FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price LIMIT 100",
    // plain-table formulation: the engine reads its range-sorted
    // re-layout (row-group pruning), which must be semantically invisible
    "scan_range_pruned" ->
      "SELECT l_orderkey, count(*) AS n, round(sum(l_quantity),2) AS qty FROM lineitem WHERE l_orderkey BETWEEN 300 AND 600 GROUP BY l_orderkey ORDER BY l_orderkey",
    // plain-table formulation: the engine reads its date-partitioned
    // re-layout (directory-level pruning), which must be semantically
    // invisible — the oracle filters the raw timestamps directly
    "scan_partition_pruned" ->
      "SELECT event_type, count(*) AS n, round(sum(value),2) AS total FROM events WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-15' GROUP BY event_type ORDER BY event_type",
    // plain-table formulation: the engine reads its Z-ordered re-layout
    // (two-dimensional row-group pruning), which must be semantically
    // invisible — the oracle filters the raw columns directly
    "scan_zorder_pruned" ->
      "SELECT event_type, count(*) AS n, round(sum(value),2) AS total FROM events WHERE user_id BETWEEN 3 AND 9 AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-18' GROUP BY event_type ORDER BY event_type",
    // plain-table formulation: the engine round-trips lineitem through
    // headered CSV (schema-declared permissive read + quarantine split)
    // before aggregating — text serialization must be semantically
    // invisible, so the oracle never sees the CSV
    "source_csv_roundtrip" ->
      ("SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS qty, " +
        "round(sum(l_extendedprice),2) AS revenue FROM lineitem " +
        "WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    // plain-table formulation: the engine round-trips documents through
    // JSON-lines; the md5 sum forces byte-exact text fidelity through
    // the escape/unescape hop
    "source_json_roundtrip" ->
      ("SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars, " +
        "CAST(sum(length(text)) AS BIGINT) AS chars_live, " +
        "CAST(sum(('0x' || substr(md5(text),1,8))::BIGINT) AS BIGINT) AS text_hash_sum " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    // plain-table formulation: the engine round-trips orders through
    // hive-partitioned ORC and prunes o_year directories at planning
    // time; the oracle filters year(o_orderdate) on the raw parquet
    "source_orc_roundtrip" ->
      ("SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice),2) AS total, " +
        "max(o_orderdate) AS last_order FROM orders " +
        "WHERE year(o_orderdate) BETWEEN 1996 AND 1998 " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // plain-table formulation: the engine round-trips orders through the
    // hand-rolled Avro object-container codec (deflate, null-union on the
    // derived every-11th-custkey column, local-timestamp-micros); the
    // oracle computes the identical aggregate from raw parquet with the
    // null derivation inlined — any mis-decoded byte moves the hash
    "source_avro_roundtrip" ->
      ("SELECT o_orderstatus, count(*) AS n, " +
        "count(CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END) AS n_cust, " +
        "CAST(sum(CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END) AS BIGINT) AS sum_cust, " +
        "round(sum(o_totalprice),2) AS total, " +
        "max(o_orderdate) AS last_order, " +
        "CAST(sum(o_orderkey % 97) AS BIGINT) AS sum_bucket, " +
        "CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // Avro quarantine invisibility: the two planted corrupt containers
    // must cost exactly two quarantine rows and ZERO data movement —
    // the aggregate over clean rows equals the plain table's
    "source_avro_quarantine" ->
      ("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END) AS BIGINT) AS sum_cust, " +
        "round(sum(o_totalprice),2) AS total, " +
        "CAST(2 AS BIGINT) AS n_quarantined " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // split invisibility: the engine reads ONE many-block container via
    // ~24 forced byte-range tasks (seek + sync-scan); the oracle is the
    // plain-table aggregate, so any block decoded twice, dropped, or
    // mis-synced moves the hash
    "source_avro_split" ->
      ("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END) AS BIGINT) AS sum_cust, " +
        "round(sum(o_totalprice),2) AS total, " +
        "max(o_orderkey) AS last_key " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // crawl-to-text invisibility: the oracle rebuilds each page's HTML
    // from the key and applies the same tag strip — a CRLF slip, HTTP
    // header mis-split, gzip member error, or Content-Length
    // off-by-one in the engine's WARC walk moves text or lengths
    "source_warc_extract" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "'<html><head><title>T' || p_partkey || '</title></head><body>' || " +
        "'<p>alpha ' || p_partkey || ' beta ' || ((p_partkey * p_partkey) % 9973) || '</p>' || " +
        "'<b>tok' || (p_partkey % 13) || '</b></body></html>' AS html " +
        "FROM part WHERE p_partkey <= 150) " +
        "SELECT k, 'http://site-' || (k % 7) || '.example/page/' || k AS target_uri, " +
        "CAST(CASE WHEN k % 10 = 0 THEN 404 ELSE 200 END AS BIGINT) AS status, " +
        "'text/html; charset=utf-8' AS http_ctype, " +
        "CAST(length(html) AS BIGINT) AS body_len, " +
        graft.functions.Html.duckExtractSql("html") + " AS text, " +
        "CAST(length(" + graft.functions.Html.duckExtractSql("html") +
        ") AS BIGINT) AS n_text_chars " +
        "FROM t ORDER BY k"),
    // chunked-transfer invisibility: the engine dechunks every varying-
    // framing chunked HTTP body and extracts text; the oracle rebuilds
    // the UNCHUNKED closed form — a kept framing byte, lost tail chunk,
    // or un-decoded entity moves body_len/text/n_text_chars
    "source_warc_chunked" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "'<html><head><title>C' || p_partkey || '</title>' || " +
        "'<style>p { margin: ' || (p_partkey % 7) || 'px; }</style></head>' || " +
        "'<body><script>var n = ' || p_partkey || '; if (n < 100 && n > 3) { mark(n); }</script>' || " +
        "'<p>chunked ' || p_partkey || ' gamma ' || ((p_partkey * 31) % 9973) || ' &amp; delta ' || " +
        "'&lt;' || (p_partkey % 13) || '&gt;&nbsp;end</p></body></html>' AS html " +
        "FROM part WHERE p_partkey <= 150) " +
        "SELECT k, CAST(CASE WHEN k % 10 = 0 THEN 404 ELSE 200 END AS BIGINT) AS status, " +
        "CAST(length(html) AS BIGINT) AS body_len, " +
        graft.functions.Html.duckExtractSql("html") + " AS text, " +
        "CAST(length(" + graft.functions.Html.duckExtractSql("html") +
        ") AS BIGINT) AS n_text_chars " +
        "FROM t ORDER BY k"),
    // gzip-content-encoding invisibility: the engine dechunks then
    // gunzips each body; the oracle is the UNCOMPRESSED closed form, so
    // a skipped gunzip, wrong layering, or truncated stream moves
    // body_len/text
    "source_warc_encoded" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "'<html><head><title>G' || p_partkey || '</title></head>' || " +
        "'<body><script>var g = ' || p_partkey || '; if (g < 50 && g > 1) { ping(g); }</script>' || " +
        "'<p>gzipped ' || p_partkey || ' sigma ' || ((p_partkey * 37) % 9973) || ' &amp; rho &lt;' || (p_partkey % 11) || '&gt; fin</p>' || " +
        "'</body></html>' AS html " +
        "FROM part WHERE p_partkey <= 150) " +
        "SELECT k, CAST(CASE WHEN k % 10 = 0 THEN 404 ELSE 200 END AS BIGINT) AS status, " +
        "CAST(length(html) AS BIGINT) AS body_len, " +
        graft.functions.Html.duckExtractSql("html") + " AS text, " +
        "CAST(length(" + graft.functions.Html.duckExtractSql("html") +
        ") AS BIGINT) AS n_text_chars " +
        "FROM t ORDER BY k"),
    // robots compliance: the oracle pins every RFC 9309 decision the
    // fixture's rule set implies — a wrong group pick (otherbot's
    // block-all or the * fallback), specificity rule, allow tie-break,
    // or wildcard/$ translation flips `allowed` rows
    "crawl_robots_filter" ->
      ("SELECT p_partkey AS k, CAST(p_partkey % 7 AS BIGINT) AS site, " +
        "CASE p_partkey % 6 " +
        "WHEN 0 THEN '/cat/' || (p_partkey % 7) || '/item' || p_partkey " +
        "WHEN 1 THEN '/public/item' || p_partkey " +
        "WHEN 2 THEN '/private/doc' || p_partkey " +
        "WHEN 3 THEN '/private/ok/doc' || p_partkey " +
        "WHEN 4 THEN '/public/file' || p_partkey || '.pdf' " +
        "ELSE '/dl/v' || (p_partkey % 3) || '/raw' || p_partkey END AS path, " +
        "(p_partkey % 6) IN (1, 3) AS allowed " +
        "FROM part WHERE p_partkey <= 300 ORDER BY k"),
    // charset invisibility: six declaration/encoding shapes (BOM >
    // Content-Type > meta prescan > cp1252 default, incl. a LYING
    // header beaten by the BOM) all decode back to the same logical
    // page text the oracle rebuilds with chr() codepoints — one wrong
    // precedence rule, label alias, or BOM strip moves text/n_chars
    "source_warc_charset" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "CASE p_partkey % 6 WHEN 2 THEN '<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=iso-8859-1\">' ELSE '' END AS meta, " +
        "CASE p_partkey % 6 " +
        "WHEN 0 THEN chr(937) || chr(945) || chr(946) || chr(947) " +
        "WHEN 1 THEN 'caf' || chr(233) || ' ' || chr(8364) " +
        "WHEN 2 THEN 'caf' || chr(233) || ' ' || chr(177) " +
        "WHEN 3 THEN 'na' || chr(239) || 've ' || chr(937) " +
        "WHEN 4 THEN 'r' || chr(233) || 'sum' || chr(233) " +
        "ELSE 'utf16 ' || chr(10003) END AS payload, " +
        "CASE p_partkey % 6 WHEN 0 THEN 'UTF-8' WHEN 3 THEN 'UTF-8' " +
        "WHEN 5 THEN 'UTF-16LE' ELSE 'windows-1252' END AS charset " +
        "FROM part WHERE p_partkey <= 150), " +
        "h AS (SELECT k, charset, " +
        "'<html><head><title>E' || k || '</title>' || meta || '</head><body>' || " +
        "'<p>enc ' || k || ' ' || payload || ' tail ' || ((k * 41) % 9973) || " +
        "'</p></body></html>' AS html FROM t) " +
        "SELECT k, charset, " +
        graft.functions.Html.duckExtractSql("html") + " AS text, " +
        "CAST(length(" + graft.functions.Html.duckExtractSql("html") +
        ") AS BIGINT) AS n_chars " +
        "FROM h ORDER BY k"),
    // revisit-record resolution: digests are content-addressed, so the
    // oracle recomputes every sha256 itself (writer header, reader
    // parse, and join must all agree with DuckDB's own hash) and pins
    // resolved/refers_match/text per fetch, phantom digests unresolved
    "source_warc_revisit" ->
      ("WITH p AS (SELECT p_partkey AS k FROM part WHERE p_partkey <= 300), " +
        "t AS (SELECT k, k % 40 AS c, (k >= 40 AND k % 37 = 0) AS phantom FROM p), " +
        "b AS (SELECT k, c, phantom, " +
        "'<html><body><p>content ' || c || ' gamma ' || ((c * 61) % 9973) || '</p></body></html>' AS html, " +
        "'content ' || c || ' gamma ' || ((c * 61) % 9973) AS txt FROM t) " +
        "SELECT k, " +
        "CASE WHEN k < 40 THEN 'response' ELSE 'revisit' END AS warc_type, " +
        "CASE WHEN phantom THEN sha256('phantom ' || k) ELSE sha256(html) END AS digest, " +
        "CASE WHEN phantom THEN NULL ELSE CAST(c AS BIGINT) END AS source_k, " +
        "NOT phantom AS resolved, " +
        "NOT phantom AS refers_match, " +
        "CASE WHEN phantom THEN NULL ELSE txt END AS text, " +
        "CASE WHEN phantom THEN NULL ELSE CAST(length(txt) AS BIGINT) END AS n_chars " +
        "FROM b ORDER BY k"),
    // redirect-chain resolution: the oracle rebuilds the closed-form
    // redirect graph and replays the identical bounded-3-hop join
    // cascade with visited-prefix loop detection — a mis-parsed
    // Location, wrong join, or wrong loop/dangling precedence flips
    // final_path/n_hops/resolved/looped
    "source_warc_redirect" ->
      ("WITH p AS (SELECT p_partkey AS k FROM part WHERE p_partkey <= 300), " +
        "rec AS (SELECT k, '/r/' || k AS u0, " +
        "CAST(CASE WHEN k % 10 IN (0, 5, 7) THEN 301 WHEN k % 10 = 4 THEN 302 ELSE 200 END AS BIGINT) AS status, " +
        "CASE WHEN k % 10 IN (0, 4, 5) THEN '/r/' || (k + 1) " +
        "WHEN k % 10 = 7 THEN '/r/' || k ELSE NULL END AS u1 FROM p), " +
        "j AS (SELECT r.k, r.u0, r.status, r.u1, " +
        "a.status AS s1, a.u1 AS u2, b.status AS s2, b.u1 AS u3, c.status AS s3 " +
        "FROM rec r LEFT JOIN rec a ON r.u1 = a.u0 " +
        "LEFT JOIN rec b ON a.u1 = b.u0 LEFT JOIN rec c ON b.u1 = c.u0) " +
        "SELECT k, status, " +
        "CASE WHEN status = 200 THEN u0 " +
        "WHEN u1 = u0 OR s1 IS NULL OR s1 = 200 THEN u1 " +
        "WHEN u2 IN (u0, u1) OR s2 IS NULL OR s2 = 200 THEN u2 " +
        "ELSE u3 END AS final_path, " +
        "CAST(CASE WHEN status = 200 THEN 0 " +
        "WHEN u1 = u0 OR s1 IS NULL OR s1 = 200 THEN 1 " +
        "WHEN u2 IN (u0, u1) OR s2 IS NULL OR s2 = 200 THEN 2 " +
        "ELSE 3 END AS BIGINT) AS n_hops, " +
        "CASE WHEN status = 200 THEN TRUE " +
        "WHEN u1 = u0 THEN FALSE WHEN s1 IS NULL THEN FALSE WHEN s1 = 200 THEN TRUE " +
        "WHEN u2 IN (u0, u1) THEN FALSE WHEN s2 IS NULL THEN FALSE WHEN s2 = 200 THEN TRUE " +
        "WHEN u3 IN (u0, u1, u2) THEN FALSE WHEN s3 = 200 THEN TRUE " +
        "ELSE FALSE END AS resolved, " +
        "CASE WHEN status = 200 THEN FALSE " +
        "WHEN u1 = u0 THEN TRUE WHEN s1 IS NULL OR s1 = 200 THEN FALSE " +
        "WHEN u2 IN (u0, u1) THEN TRUE WHEN s2 IS NULL OR s2 = 200 THEN FALSE " +
        "WHEN u3 IN (u0, u1, u2) THEN TRUE ELSE FALSE END AS looped " +
        "FROM j ORDER BY k"),
    // robots percent-encoding: unreserved escapes decode before
    // comparison, reserved/non-ASCII escapes stay encoded with hex
    // case-folded, %2F never equals literal /; the oracle pins each
    // decision closed-form
    "crawl_robots_pctenc" ->
      ("SELECT p_partkey AS k, " +
        "CASE p_partkey % 6 " +
        "WHEN 0 THEN '/caf%C3%A9/item' || p_partkey " +
        "WHEN 1 THEN '/caf%c3%a9/item' || p_partkey " +
        "WHEN 2 THEN '/~admin/sec' || p_partkey " +
        "WHEN 3 THEN '/%7Eadmin/public/p' || p_partkey " +
        "WHEN 4 THEN '/a/b/x' || p_partkey " +
        "ELSE '/open/x' || p_partkey END AS path, " +
        "(p_partkey % 6) IN (3, 4, 5) AS allowed " +
        "FROM part WHERE p_partkey <= 300 ORDER BY k"),
    // unknown-label quarantine: exotic charset labels (header AND
    // meta-declared) must yield the `unknown:<label>` sentinel + a
    // cp1252-fallback decode, never a thrown task; the decoy
    // `x-nocharset=foo` shape pins the param-boundary parse
    "source_warc_charset_unknown" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "CASE p_partkey % 5 WHEN 2 THEN '<meta charset=euc-kr>' ELSE '' END AS meta, " +
        "CASE p_partkey % 5 " +
        "WHEN 0 THEN 'plain control' " +
        "WHEN 1 THEN 'sjis page' " +
        "WHEN 2 THEN 'kr page' " +
        "WHEN 3 THEN 'caf' || chr(233) " +
        "ELSE 'r' || chr(233) || 'sum' || chr(233) END AS payload, " +
        "CASE p_partkey % 5 WHEN 0 THEN 'UTF-8' " +
        "WHEN 1 THEN 'unknown:shift_jis' WHEN 2 THEN 'unknown:euc-kr' " +
        "WHEN 3 THEN 'unknown:iso-8859-2' " +
        "ELSE 'windows-1252' END AS charset " +
        "FROM part WHERE p_partkey <= 150), " +
        "h AS (SELECT k, charset, charset LIKE 'unknown:%' AS quarantined, " +
        "'<html><head><title>U' || k || '</title>' || meta || '</head><body>' || " +
        "'<p>unk ' || k || ' ' || payload || ' tail ' || ((k * 53) % 9973) || " +
        "'</p></body></html>' AS html FROM t) " +
        "SELECT k, charset, quarantined, " +
        graft.functions.Html.duckExtractSql("html") + " AS text, " +
        "CAST(length(" + graft.functions.Html.duckExtractSql("html") +
        ") AS BIGINT) AS n_chars " +
        "FROM h ORDER BY k"),
    // split invisibility on the crawl container: ONE fat .warc.gz read
    // as ~24 byte-range tasks via its CDX record index; a member owned
    // twice, orphaned, or mis-seeked moves the aggregate
    "source_warc_split" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "CASE WHEN p_partkey % 10 = 0 THEN 404 ELSE 200 END AS status, " +
        "length('<html><head><title>T' || p_partkey || '</title></head><body>' || " +
        "'<p>alpha ' || p_partkey || ' beta ' || ((p_partkey * p_partkey) % 9973) || '</p>' || " +
        "'<b>tok' || (p_partkey % 13) || '</b></body></html>') AS body_chars " +
        "FROM part WHERE p_partkey <= 150) " +
        "SELECT CAST(status AS BIGINT) AS status, count(*) AS n_pages, " +
        "CAST(sum(body_chars) AS BIGINT) AS sum_body_chars, " +
        "max(k) AS last_k " +
        "FROM t GROUP BY status ORDER BY status"),
    // WARC quarantine invisibility: two planted corrupt containers cost
    // exactly two quarantine rows and zero data movement — the clean
    // shards' per-status aggregate equals the closed-form page set
    "source_warc_quarantine" ->
      ("WITH t AS (SELECT p_partkey AS k, " +
        "CASE WHEN p_partkey % 10 = 0 THEN 404 ELSE 200 END AS status, " +
        "length('<html><head><title>T' || p_partkey || '</title></head><body>' || " +
        "'<p>alpha ' || p_partkey || ' beta ' || ((p_partkey * p_partkey) % 9973) || '</p>' || " +
        "'<b>tok' || (p_partkey % 13) || '</b></body></html>') AS body_chars " +
        "FROM part WHERE p_partkey <= 100) " +
        "SELECT CAST(status AS BIGINT) AS status, count(*) AS n_pages, " +
        "CAST(sum(body_chars) AS BIGINT) AS sum_body_chars, " +
        "CAST(2 AS BIGINT) AS n_quarantined " +
        "FROM t GROUP BY status ORDER BY status"),
    "filter_predicates" ->
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R') AND NOT l_linestatus = 'O' ORDER BY l_orderkey, l_linenumber, l_quantity",
    "filter_like_null" ->
      "SELECT p_partkey, p_name FROM part WHERE p_type LIKE '%PROMO%' AND p_brand IS NOT NULL ORDER BY p_partkey",
    "join_broadcast" ->
      "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_name",
    "join_shuffle" ->
      "SELECT o_orderkey, round(sum(l_extendedprice),2) AS rev FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey ORDER BY rev DESC, o_orderkey LIMIT 20",
    // the PLAIN join formulation: bucketing is a layout lever and must be
    // semantically invisible, so the oracle never sees the bucketed tables
    "join_bucketed" ->
      "SELECT o_orderkey, o_orderpriority, round(sum(l_extendedprice),2) AS rev FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey, o_orderpriority ORDER BY rev DESC, o_orderkey LIMIT 20",
    "join_star_5way" ->
      "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)),2) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name",
    "join_left_outer" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY n_orders DESC, c_custkey LIMIT 50",
    "join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000) ORDER BY c_custkey",
    "join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') ORDER BY c_custkey",
    // the oracle is the PLAIN semi-join aggregate: the engine's Bloom
    // prefilter stage must be result-invisible (no false negatives;
    // false positives removed by the exact semi-join)
    "join_bloom_prefilter" ->
      ("SELECT l_returnflag, count(*) AS n_items, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "join_range_theta" ->
      "SELECT a.event_id AS a_id, b.event_id AS b_id FROM events a JOIN events b ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE AND a.event_id <> b.event_id ORDER BY a_id, b_id LIMIT 200",
    "join_asof" ->
      "SELECT o.o_orderkey, e.event_id FROM (SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderkey < 500) o LEFT JOIN LATERAL (SELECT event_id FROM events WHERE user_id = o.o_custkey % 20 AND ts <= TIMESTAMP '2024-01-15' ORDER BY ts DESC LIMIT 1) e ON true ORDER BY o_orderkey",
    // DuckDB 1.0 speaks ASOF natively — the one judged query planned by
    // the engine's custom SparkStrategy (graft.plans.AsofJoin)
    "join_asof_native" ->
      "SELECT p.event_id AS purchase_id, p.user_id AS user_id, c.click_id AS click_id FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_id FROM events WHERE event_type = 'click' GROUP BY user_id, ts) c ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY purchase_id",
    // filters chosen so BOTH sides contribute orphan rows (left-only
    // nations < 10, right-only >= 15); counts pre-aggregated per key
    // eager-agg formulation on both sides; unmatched parts surface as 0
    "join_right_outer" ->
      "SELECT p_partkey, coalesce(n, 0) AS n_heavy FROM (SELECT l_partkey, count(*) n FROM lineitem WHERE l_quantity > 45 GROUP BY 1) li RIGHT JOIN part ON l_partkey = p_partkey ORDER BY n_heavy DESC, p_partkey LIMIT 100",
    "join_full_outer" ->
      "SELECT coalesce(c.k, s.k) AS k, coalesce(nc, 0) AS nc, coalesce(ns, 0) AS ns FROM (SELECT c_nationkey k, count(*) nc FROM customer WHERE c_nationkey < 15 GROUP BY 1) c FULL JOIN (SELECT s_nationkey k, count(*) ns FROM supplier WHERE s_nationkey >= 10 GROUP BY 1) s ON c.k = s.k ORDER BY k",
    // the NAIVE theta-join formulation: the engine's temporal bucketing
    // (IntervalJoin.overlapSelfJoin) must be semantically invisible
    "join_interval_bucketed" ->
      "WITH e AS (SELECT event_id, ts AS st, ts + INTERVAL 60 MINUTE AS en FROM events WHERE user_id < 3) SELECT a.event_id a_id, b.event_id b_id FROM e a JOIN e b ON a.event_id < b.event_id AND a.st <= b.en AND b.st <= a.en ORDER BY a_id, b_id",
    "join_cross" ->
      "SELECT r1.r_name AS r1_name, r2.r_name AS r2_name FROM region r1 CROSS JOIN region r2 ORDER BY 1, 2",
    // the PLAIN join formulation: the engine's salted plan must be
    // semantically invisible, so the oracle carries no salt at all
    "join_skew_salted" ->
      "SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice),2) AS rev FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "agg_pricing_summary" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty, round(sum(l_extendedprice),2) sum_base, round(sum(l_extendedprice*(1-l_discount)),2) sum_disc, round(avg(l_quantity),6) avg_qty, round(avg(l_extendedprice),4) avg_price, round(avg(l_discount),6) avg_disc, count(*) cnt FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "agg_count_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) u FROM events GROUP BY event_type ORDER BY event_type",
    // KMV sketch in its exact regime (per-group distinct < k=1024, an
    // invariant of the suite's fixed lineitem/supplier ratio): the
    // sketch estimate IS the exact distinct count, so the oracle is
    // plain count(distinct)
    "agg_kmv_distinct" ->
      "SELECT l_suppkey, count(DISTINCT l_orderkey) n_orders FROM lineitem GROUP BY 1 ORDER BY 1",
    // Count-Min sketch in its exact regime (~10 distinct keys in 1024
    // cells × 4 rows, fixed seeds — the min-row estimate equals the
    // true count deterministically), so the oracle is a plain GROUP BY;
    // the engine side builds per-year sketches, merges, then probes
    "agg_cms_freq" ->
      "SELECT o_orderstatus st, o_orderpriority pr, count(*) n FROM orders GROUP BY 1, 2 ORDER BY 1, 2",
    // Misra-Gries in the exact regime (5 distinct keys << K=64): no
    // truncation at any stage -> every estimate is the exact count and
    // the error band is 0; the judged err_band column witnesses it
    "agg_heavy_hitters" ->
      "SELECT event_type, count(*) AS n, CAST(0 AS BIGINT) AS err_band FROM events GROUP BY 1 ORDER BY 1",
    // discrete quartiles: quantile_disc picks the element at 1-based
    // rank ceil(q*n) -- the engine derives the same element from a
    // (group, value) count table + cumulative window; exact integers
    "agg_percentile_disc" ->
      ("WITH q AS (SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS qc FROM lineitem) " +
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
        "quantile_disc(qc, 0.25) AS q1_qc, quantile_disc(qc, 0.5) AS q2_qc, " +
        "quantile_disc(qc, 0.75) AS q3_qc " +
        "FROM q GROUP BY l_returnflag ORDER BY l_returnflag"),
    // weighted median: smallest value whose cumulative weight reaches
    // half the total; both engines state the definition over the
    // cumulative-weight window (neither has it built in), exact int64
    "agg_weighted_median" ->
      ("WITH q AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS pc, " +
        "CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem), " +
        "g AS (SELECT l_returnflag, pc, CAST(sum(w) AS BIGINT) AS w FROM q GROUP BY 1, 2), " +
        "c AS (SELECT *, CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY pc) AS BIGINT) AS cw, " +
        "CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw FROM g) " +
        "SELECT l_returnflag, CAST(min(tw) AS BIGINT) AS total_w, " +
        "min(CASE WHEN 2 * cw >= tw THEN pc END) AS wmedian_pc " +
        "FROM c GROUP BY l_returnflag ORDER BY l_returnflag"),
    "agg_filtered" ->
      "SELECT user_id, count(*) FILTER (WHERE event_type = 'purchase') purchases, round(sum(value) FILTER (WHERE event_type = 'purchase'),2) spend FROM events GROUP BY user_id ORDER BY user_id",
    "agg_rollup" ->
      "SELECT coalesce(l_returnflag,'ALL') rf, coalesce(l_linestatus,'ALL') ls, count(*) c FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY 1, 2",
    "agg_cube" ->
      "SELECT coalesce(o_orderstatus,'ALL') st, coalesce(o_orderpriority,'ALL') pr, round(sum(o_totalprice),2) s FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY 1, 2",
    "agg_grouping_sets" ->
      "SELECT coalesce(event_type,'ALL') et, coalesce(CAST(user_id AS VARCHAR),'ALL') uid, count(*) c FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ()) ORDER BY 1, 2",
    "agg_regression" ->
      "SELECT event_type, round(regr_slope(value, user_id),6) + 0 AS slope, round(regr_intercept(value, user_id),6) + 0 AS icept, round(regr_r2(value, user_id),6) AS r2, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
    "agg_stats" ->
      "SELECT event_type, round(stddev_samp(value),6) sd, round(var_samp(value),6) vr, round(min(value),2) mn, round(max(value),2) mx FROM events GROUP BY event_type ORDER BY event_type",
    "agg_percentile" ->
      "SELECT event_type, round(quantile_cont(value, 0.5),6) med, round(quantile_cont(value, 0.95),6) p95 FROM events GROUP BY event_type ORDER BY event_type",
    // numeric sort BEFORE the string render (lexicographic would corrupt)
    "agg_array_sorted" ->
      "SELECT o_custkey, array_to_string(list_sort(array_agg(o_orderkey)), ',') AS ids FROM orders WHERE o_orderkey < 1000 GROUP BY o_custkey ORDER BY o_custkey",
    "agg_having" ->
      "SELECT o_custkey, count(*) c FROM orders GROUP BY o_custkey HAVING count(*) > 5 ORDER BY c DESC, o_custkey LIMIT 50",
    "agg_bool" ->
      "SELECT l_returnflag, l_linestatus, bool_and(l_quantity > 1.0) AS all_multi_qty, bool_or(l_discount > 0.09) AS any_deep_discount, count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    // ordered WITHIN GROUP so the concatenation is deterministic
    "agg_string_agg" ->
      "SELECT o_orderpriority, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses, count(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "win_rank_topk_per_group" ->
      "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn",
    "win_rank_dense" ->
      "SELECT c_custkey, c_acctbal, rank() OVER (ORDER BY c_acctbal DESC, c_custkey) r, dense_rank() OVER (ORDER BY round(c_acctbal,0) DESC) dr FROM customer ORDER BY r LIMIT 100",
    // the oracle uses the plain global window; the engine must reproduce
    // it WITHOUT one (GlobalRank distributed dense rank)
    "win_dense_rank_global" ->
      "SELECT o_orderkey, CAST(dense_rank() OVER (ORDER BY round(o_totalprice, -2) DESC) AS BIGINT) AS dr FROM orders ORDER BY o_orderkey LIMIT 500",
    // string-keyed global rank: md5 hex is identical across engines and
    // ASCII, so binary string order agrees between Spark and DuckDB
    "win_rank_string_global" ->
      "SELECT doc_id, CAST(rank() OVER (ORDER BY md5(text), doc_id) AS BIGINT) AS r FROM documents ORDER BY doc_id LIMIT 300",
    // plain-window formulation: the engine's counts-only rank (value
    // table + weighted prefix sums, no per-row window) must be invisible
    "win_rank_value_global" ->
      "SELECT event_id, CAST(rank() OVER (ORDER BY value) AS BIGINT) AS r FROM events ORDER BY event_id LIMIT 500",
    // explicit unbounded-both-ways frame on BOTH sides: the default
    // growing frame would NULL the first two rows per partition
    "win_nth_value" ->
      "SELECT DISTINCT o_custkey, nth_value(o_totalprice, 3) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_price FROM orders WHERE o_custkey < 500 QUALIFY third_price IS NOT NULL ORDER BY o_custkey",
    // plain-window oracle; the engine's distributed counts-path cume_dist
    // (no single-partition window) must be invisible
    "win_cume_dist" ->
      "SELECT event_id, round(cume_dist() OVER (ORDER BY value), 6) AS cd FROM events ORDER BY event_id LIMIT 500",
    "win_lag_lead" ->
      "SELECT user_id, event_id, round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),2) dv, lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) nxt FROM events ORDER BY user_id, event_id LIMIT 500",
    // IGNORE NULLS navigation: forward-fill + previous-non-null of a
    // sparse signal; pass-through values, no rounding needed
    "win_lag_ignore_nulls" ->
      "SELECT user_id, event_id, last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS last_purchase, lag(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase FROM events WHERE user_id < 10 ORDER BY user_id, event_id",
    // quantile_cont interpolates exactly like Spark's exact percentile
    "win_rolling_median" ->
      "SELECT user_id, event_id, round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5 FROM events WHERE user_id < 10 ORDER BY user_id, event_id",
    "win_moving_avg" ->
      "SELECT user_id, event_id, round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),6) ma5 FROM events ORDER BY user_id, event_id LIMIT 500",
    "win_cumsum" ->
      "SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING),2) cum FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500",
    // SUM not AVG over the frame: value is 2-dp, so the sum is an
    // integer number of cents (boundary-safe at round 2) while an avg
    // lands exactly on .xx5 boundaries where engines' float error
    // rounds in opposite directions (flapped at sf0.001)
    "win_range_numeric" ->
      "SELECT event_id, event_type, count(*) OVER (PARTITION BY event_type ORDER BY value RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS c50, round(sum(value) OVER (PARTITION BY event_type ORDER BY value RANGE BETWEEN 50 PRECEDING AND CURRENT ROW), 2) AS s50 FROM events ORDER BY event_id LIMIT 500",
    "win_range_time" ->
      "SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) c10m FROM events ORDER BY event_id LIMIT 500",
    "win_first_last" ->
      "SELECT user_id, event_id, first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) f, last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) l FROM events ORDER BY user_id, event_id LIMIT 500",
    "win_ntile_pctrank" ->
      "SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) q, round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey),6) pr FROM customer ORDER BY c_custkey LIMIT 200",
    "sort_multi" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber LIMIT 100",
    "topk_global" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "set_union" ->
      "SELECT c_nationkey k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k",
    "set_union_all" ->
      "SELECT count(*) AS c FROM (SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)",
    "set_intersect" ->
      "SELECT c_nationkey k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k",
    "set_intersect_all" ->
      "SELECT c_nationkey k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY k",
    "set_except" ->
      "SELECT c_nationkey k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k",
    "set_except_all" ->
      "SELECT c_nationkey k FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY k",
    "fn_string" ->
      "SELECT c_custkey, upper(c_name) u, substring(c_name, 10, 9) tail, length(c_name) ln, concat(c_name, '-', c_mktsegment) cc, replace(c_name,'Customer','Cust') rp FROM customer ORDER BY c_custkey LIMIT 100",
    "fn_string_extras" ->
      "SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded, split_part(c_name, '#', 2) AS numpart, left(c_mktsegment, 4) AS seg4, right(c_name, 3) AS tail3, translate(c_name, '#', '-') AS dashed, CAST(instr(c_name, '#') AS BIGINT) AS hashpos, repeat(left(c_mktsegment, 1), 3) AS tri FROM customer ORDER BY c_custkey LIMIT 100",
    // malformed input -> NULL, not a job failure (the 100 TB boundary
    // contract; sources/Ingest's quarantine rides the same semantics)
    "fn_try_cast" ->
      "SELECT doc_id, TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS VARCHAR) ELSE lang END AS INT) AS maybe_int, TRY_CAST(lang AS DATE) IS NULL AS bad_date, TRY_CAST(CAST(doc_id AS VARCHAR) || '.5' AS DOUBLE) AS frac FROM documents ORDER BY doc_id LIMIT 200",
    "fn_regexp" ->
      "SELECT p_partkey, regexp_extract(p_brand, '#([0-9]+)', 1) brand_num FROM part ORDER BY p_partkey LIMIT 200",
    "fn_date" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) y, CAST(month(o_orderdate) AS INT) m, date_trunc('month', o_orderdate) mt, o_orderdate + INTERVAL 30 DAY due FROM orders ORDER BY o_orderkey LIMIT 200",
    "fn_math" ->
      "SELECT l_orderkey, l_linenumber, round(sqrt(l_extendedprice),6) sq, round(ln(l_extendedprice),6) lg, abs(l_discount - 0.05) ab, CAST(ceil(l_quantity) AS BIGINT) ce, CAST(floor(l_quantity) AS BIGINT) fl, CAST(l_quantity AS INT) % 7 md FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity LIMIT 200",
    "fn_bitwise" ->
      "SELECT l_orderkey, l_linenumber, l_orderkey & 255 AS bnd, l_orderkey | 15 AS orr, xor(l_orderkey, l_partkey) AS xr, l_orderkey << 2 AS shl, l_orderkey >> 3 AS shr FROM lineitem ORDER BY l_orderkey, l_linenumber, xr LIMIT 200",
    "fn_binhex" ->
      "SELECT c_custkey, to_base64(CAST(c_name AS BLOB)) b64, hex(c_custkey) hx, md5(c_name) h5 FROM customer ORDER BY c_custkey LIMIT 100",
    "fn_case_coalesce" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END bucket, coalesce(nullif(o_orderstatus,'O'), 'OPEN') st FROM orders ORDER BY o_orderkey LIMIT 200",
    "fn_json" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) k FROM events ORDER BY event_id LIMIT 500",
    // missing-key contract: json_extract_string of an absent key is NULL
    // in DuckDB exactly as from_json's absent struct field is in Spark
    "fn_json_struct" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) k, coalesce(json_extract_string(props, '$.tag'), 'untagged') tag FROM events ORDER BY event_id LIMIT 500",
    "fn_array_lambda" ->
      "SELECT doc_id, len(list_filter(split(text, ' '), w -> len(w) > 5)) AS n_long, round(CAST(list_aggregate(list_transform(split(text, ' '), w -> len(w)), 'sum') AS DOUBLE) / len(split(text, ' ')), 4) AS avg_len, list_aggregate(list_transform(split(text, ' '), w -> len(w)), 'max') AS max_len FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    "fn_array" ->
      "SELECT doc_id, len(string_split(text, ' ')) n_words, string_split(text,' ')[1] first_word FROM documents ORDER BY doc_id LIMIT 200",
    // machinery-blind oracle (the scan_zorder trick): the engine builds,
    // probes, folds and filters a real MAP column; the oracle replays
    // the same SCALAR outputs relationally — element_at of an absent
    // key is NULL exactly as max(n) FILTER over zero rows is
    "fn_map" ->
      ("WITH t AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2) " +
        "SELECT user_id, max(n) FILTER (WHERE event_type = 'purchase') AS purchases, " +
        "max(n) FILTER (WHERE event_type = 'click') AS clicks, " +
        "count(*) AS n_types, CAST(sum(n) AS BIGINT) AS total, " +
        "count(*) FILTER (WHERE n > 5) AS n_hot " +
        "FROM t GROUP BY user_id ORDER BY user_id"),
    // 1-based ordinals via the struct-comprehension (DuckDB 1.0 lacks
    // WITH ORDINALITY); projected flat so the output schema is scalar
    "fn_posexplode" ->
      "SELECT doc_id, u.p['pos'] AS pos, u.p['tok'] AS tok FROM (SELECT doc_id, string_split(text, ' ') l FROM documents WHERE doc_id < 20) t, unnest([{'tok': t.l[i], 'pos': i} FOR i IN range(1, len(t.l)+1)]) u(p) ORDER BY doc_id, pos",
    "fn_explode_wordcount" ->
      "SELECT w word, count(*) c FROM (SELECT unnest(string_split(text,' ')) w FROM documents) GROUP BY w ORDER BY c DESC, w LIMIT 50",
    "stream_tumbling" ->
      "SELECT date_trunc('hour', ts) wstart, event_type, count(*) c, round(sum(value),2) s FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    "stream_sliding" ->
      "SELECT ws wstart, count(*) c FROM (SELECT e.ts, g.ws FROM events e JOIN (SELECT DISTINCT date_trunc('hour', ts) - INTERVAL (k*30) MINUTE ws FROM events, (SELECT unnest([0,1]) k)) g ON e.ts >= g.ws AND e.ts < g.ws + INTERVAL 60 MINUTE) GROUP BY ws ORDER BY ws",
    "stream_session" ->
      "WITH o AS (SELECT user_id, ts, event_id, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END brk FROM events), s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) sid FROM o) SELECT user_id, sid, count(*) n, min(ts) st, max(ts) en FROM s GROUP BY user_id, sid ORDER BY user_id, sid",
    // the NATIVE session_window form is judged against the IDENTICAL
    // lag-gap oracle — the operator must be semantically invisible
    "stream_session_native" ->
      "WITH o AS (SELECT user_id, ts, event_id, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END brk FROM events), s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) sid FROM o) SELECT user_id, sid, count(*) n, min(ts) st, max(ts) en FROM s GROUP BY user_id, sid ORDER BY user_id, sid",
    // per-user session feature vector over the SAME lag-gap sessions —
    // every judged number is an exact integer (counts + µs sums)
    "ts_session_stats" ->
      ("WITH o AS (SELECT user_id, ts, event_id, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END brk FROM events), " +
        "s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) sid FROM o), " +
        "g AS (SELECT user_id, sid, count(*) AS n, epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us FROM s GROUP BY user_id, sid) " +
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events, " +
        "CAST(max(n) AS BIGINT) AS max_session_events, CAST(sum(span_us) AS BIGINT) AS engaged_us, " +
        "max(span_us) AS max_span_us FROM g GROUP BY user_id ORDER BY user_id"),
    "stream_dedup" ->
      "SELECT count(*) AS c FROM (SELECT DISTINCT user_id, event_type FROM events)",
    "stream_late_filter" ->
      "SELECT count(*) c FROM events WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 1 DAY",
    "ts_funnel" ->
      "WITH w1 AS (SELECT user_id, event_type, ts, min(CASE WHEN event_type='view' THEN ts END) OVER (PARTITION BY user_id) AS t_view FROM events), w2 AS (SELECT *, min(CASE WHEN event_type='click' AND ts > t_view THEN ts END) OVER (PARTITION BY user_id) AS t_click FROM w1), w3 AS (SELECT *, min(CASE WHEN event_type='purchase' AND ts > t_click THEN ts END) OVER (PARTITION BY user_id) AS t_purchase FROM w2) SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click, min(t_purchase) AS t_purchase FROM w3 GROUP BY user_id HAVING min(t_view) IS NOT NULL ORDER BY user_id",
    "win_gaps_islands" ->
      "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), r AS (SELECT user_id, day, row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d) SELECT user_id, CAST(min(day) AS TIMESTAMP) AS island_start, CAST(max(day) AS TIMESTAMP) AS island_end, count(*) AS n_days FROM r GROUP BY user_id, day - CAST(rn AS INTEGER) ORDER BY user_id, island_start",
    "ts_retention_cohort" ->
      "WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort FROM events GROUP BY user_id), a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events) SELECT CAST(f.cohort AS TIMESTAMP) AS cohort, CAST((a.wk - f.cohort)/7 AS INT) AS week_n, count(DISTINCT a.user_id) AS n_users FROM a JOIN f USING(user_id) GROUP BY 1,2 ORDER BY 1,2",
    // SUM not AVG per bin: three sf0.01 bins have means exactly on a
    // half-cent, where summation-order float error flips the rounding
    "agg_histogram" ->
      "SELECT event_type, CAST(floor(value/50) AS INT) AS bin, count(*) AS c, round(sum(value),2) AS sum_v FROM events GROUP BY 1,2 ORDER BY 1,2",
    "agg_mode" ->
      "WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1,2), r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn FROM c) SELECT user_id, event_type AS mode_type, c AS n FROM r WHERE rn=1 ORDER BY user_id",
    // day ships as a midnight timestamp (judged-date convention);
    // open/close are first/last by the unique-per-user ts
    "ts_ohlc_resample" ->
      "SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, round(first(value ORDER BY ts), 2) AS open_v, round(max(value), 2) AS high_v, round(min(value), 2) AS low_v, round(last(value ORDER BY ts), 2) AS close_v, count(*) AS n FROM events WHERE user_id < 10 GROUP BY 1, 2 ORDER BY user_id, day",
    // dense daily spine generated per user; missing days flagged 0-rows
    "ts_gap_fill" ->
      "WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 2) AS v FROM events WHERE user_id < 10 GROUP BY 1, 2), spine AS (SELECT user_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day FROM (SELECT user_id, min(day) mn, max(day) mx FROM daily GROUP BY 1)) SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day, coalesce(d.v, 0.0) AS v, (d.v IS NULL) AS filled FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day ORDER BY s.user_id, day",
    "llm_exact_dedup" ->
      "SELECT md5(text) h, count(*) c, min(doc_id) keeper FROM documents GROUP BY md5(text) ORDER BY h",
    "llm_dedup_keep_first" ->
      "SELECT user_id, event_type, min(event_id) keeper, count(*) dups FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    "llm_docstats" ->
      "SELECT lang, count(*) docs, round(avg(n_chars),4) avg_chars, round(avg(len(string_split(text,' '))),4) avg_words FROM documents GROUP BY lang ORDER BY lang",
    "llm_ngrams" ->
      "WITH w AS (SELECT doc_id, string_split(text,' ') ws FROM documents), b AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] bg FROM w, (SELECT unnest(range(1, 200)) i) WHERE i < len(ws)) SELECT bg, count(*) c FROM b GROUP BY bg ORDER BY c DESC, bg LIMIT 30",
    // exact-KNN oracle shared by the two round-14 ANN-serving rows:
    // ann_ivf_exact (nprobe = nlist → list pruning drops nothing) and
    // ann_pq_rerank_exact (shortlist = corpus → truncation drops
    // nothing) are each PROVABLY brute-force cosine top-k, so the
    // persisted-index / PQ-code serving machinery is judged as
    // invisible against plain exact KNN. Ranking on the RAW double
    // (rounding only at output), id tie-break, like the engine.
    "ann_ivf_exact" -> annExactKnnSql,
    "ann_pq_rerank_exact" -> annExactKnnSql,
    // IVFADC at nprobe=nlist + corpus-wide shortlist: both reductions
    // exhausted, so the composed stack provably equals brute force
    "ann_ivfpq_exact" -> annExactKnnSql,
    "llm_cosine_topk" ->
      "SELECT a.vec_id, b.vec_id nb, round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) sim FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id WHERE a.vec_id < 10 QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY sim DESC, b.vec_id) <= 5 ORDER BY a.vec_id, sim DESC, nb",
    "llm_knn_label" ->
      "SELECT label, count(*) c, round(avg(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))),6) avg_sim FROM embeddings GROUP BY label ORDER BY label",
    "llm_minhash_jaccard" ->
      "WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) toks FROM documents WHERE doc_id < 50) SELECT * FROM (SELECT a.doc_id a_id, b.doc_id b_id, round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(list_distinct(list_concat(a.toks, b.toks))), 6) jac FROM t a JOIN t b ON a.doc_id < b.doc_id) WHERE jac > 0.6 ORDER BY a_id, b_id",
    // incremental-append invisibility: the engine runs base-store +
    // Bloom-gated delta append; the oracle is the one-shot full
    // recompute the incremental path must be byte-identical to
    "llm_dedup_append" ->
      "SELECT min(doc_id) AS doc_id, md5(text) AS h FROM documents GROUP BY md5(text) ORDER BY doc_id",
    // deterministic hash-draw importance sampling — pure integer compare,
    // replayable by any engine (the property rand()/sample() cannot give)
    "llm_importance_sample" ->
      ("SELECT doc_id, lang, n_chars, " +
        "('0x' || substr(md5('rs:' || doc_id), 1, 8))::BIGINT % 2000 AS draw " +
        "FROM documents " +
        "WHERE ('0x' || substr(md5('rs:' || doc_id), 1, 8))::BIGINT % 2000 < least(n_chars, 2000) " +
        "ORDER BY doc_id"),
    // the full curation funnel in one query: stats → quality filters →
    // exact-dedup keep-first (judged composition of the #49/#51 pieces)
    "llm_curate_chain" ->
      "WITH stats AS (SELECT doc_id, lang, text, n_chars, len(string_split(text,' ')) AS n_tok, len(list_distinct(string_split(text,' '))) AS n_uniq FROM documents), filtered AS (SELECT * FROM stats WHERE n_chars BETWEEN 50 AND 2000 AND n_tok BETWEEN 5 AND 500 AND n_uniq * 1.0 / n_tok >= 0.3), dedup AS (SELECT doc_id, lang, n_tok, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn FROM filtered) SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok FROM dedup WHERE rn = 1 ORDER BY doc_id",
    // schema evolution: the oracle derives the merged-footer read's
    // expected rows from the plain table (even keys wrote WITHOUT the
    // priority column, odd keys WITH it)
    "source_schema_evolution" ->
      ("SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority ELSE 'MISSING' END AS pr, " +
        "CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS rev " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    "subq_scalar_corr" ->
      "SELECT o_orderkey, o_totalprice FROM orders o WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey LIMIT 100",
    "subq_in" ->
      "SELECT p_partkey FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45) ORDER BY p_partkey LIMIT 200",
    "subq_not_in" ->
      "SELECT p_partkey FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49) ORDER BY p_partkey LIMIT 200",
    // correlated EXISTS over an aggregated subquery: the HAVING must
    // decorrelate to aggregate-then-semi-join on the correlation key
    "subq_exists_having" ->
      ("SELECT c_custkey, c_mktsegment FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = '1-URGENT' " +
        "GROUP BY o.o_custkey HAVING sum(o.o_totalprice) > 300000) " +
        "ORDER BY c_custkey LIMIT 200"),
    // §2.13 training-data pipeline (round 2). Cross-engine hash parity
    // notes: token codes come from md5 (standardized) not xxhash64
    // (Spark-only); DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all; DuckDB list_reduce seeds with the first
    // element, which equals Spark's aggregate(..., 0, ...) for both the
    // polynomial fold ((0*31+c)%M = c) and the bitwise-or fold (0|c = c).
    "text_quality" ->
      ("WITH t AS (SELECT doc_id, CAST(length(text) AS DOUBLE) len, CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) na, " +
        "CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) np, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) words FROM documents) " +
        "SELECT doc_id, round(greatest(0.0, least((CASE WHEN len > 0 THEN na / len ELSE 0.0 END) * 0.4 " +
        "+ (1.0 - least(abs((CASE WHEN words > 0 THEN na / words ELSE 0.0 END) - 5.5) / 5.5, 1.0)) * 0.3 " +
        "+ least(len / 200.0, 1.0) * 0.2 " +
        "+ (1.0 - least((CASE WHEN len > 0 THEN np / len ELSE 0.0 END) * 5.0, 1.0)) * 0.1, 1.0)), 6) AS quality " +
        "FROM t ORDER BY doc_id LIMIT 300"),
    "text_tokencount" ->
      ("SELECT lang, count(*) AS docs, CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens, " +
        "CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpeish_tokens, " +
        "round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_words FROM documents GROUP BY lang ORDER BY lang"),
    // HTML extraction replay: the oracle rebuilds the identical page
    // from doc_id+text and applies Html.duckExtractSql — GENERATED from
    // the same regex/entity table the engine folds (single source of
    // truth), so a kept script fragment, wrong decode order, or
    // mis-decoded exotic entity moves text/lengths and fails the hash
    "text_html_extract" ->
      ("WITH t AS (SELECT doc_id, " +
        "'<html><head><title>D' || doc_id || " +
        "'</title><style type=\"text/css\">body { color: #' || (doc_id % 1000) || " +
        "'; }</style></head><body><script src=\"app.js\"></script><script>var k = ' || doc_id || " +
        "'; if (k < 10 && k > 0) { trackPage(k); }</script><!-- ad slot ' || (doc_id % 5) || " +
        "' > banner --><h1>Doc &quot;' || doc_id || " +
        "'&quot;</h1><p>' || substr(text, 1, 160) || " +
        "' &amp; more &amp;lt; tail &lt;' || (doc_id % 97) || " +
        "'&gt;&nbsp;&#169; end</p></body></html>' AS html FROM documents), " +
        "e AS (SELECT doc_id, CAST(length(html) AS BIGINT) AS n_chars_html, " +
        graft.functions.Html.duckExtractSql("html") + " AS text FROM t) " +
        "SELECT doc_id, n_chars_html, text, " +
        "CAST(length(text) AS BIGINT) AS n_chars_text, " +
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens " +
        "FROM e ORDER BY doc_id LIMIT 300"),
    // BPE replay: the SAME pinned merge table as a replace() chain with
    // private-use placeholder chars (generated from graft.functions.Bpe
    // — single source of truth); SQL replace is the same leftmost
    // non-overlapping pass a merge rule performs, so counts are exact
    "text_bpe_tokencount" ->
      ("WITH t AS (SELECT doc_id, CAST(" +
        graft.functions.Bpe.duckCountSql("lower(text)") +
        " AS BIGINT) AS bpe_tokens, CAST(length(text) AS BIGINT) AS n_chars " +
        "FROM documents WHERE doc_id < 300) " +
        "SELECT doc_id, bpe_tokens, n_chars, " +
        "round(CAST(n_chars AS DOUBLE) / bpe_tokens, 4) AS chars_per_token " +
        "FROM t ORDER BY doc_id"),
    // BPE sequence replay: fold the ENCODED string's codepoints with the
    // same rolling hash the engine folds its mapped symbol ids with —
    // the placeholder codepoints ARE the merged-symbol codes, so the two
    // folds run over identical integers
    "text_bpe_sequence" ->
      ("WITH t AS (SELECT doc_id, " +
        graft.functions.Bpe.duckEncodeSql("lower(text)") + " AS enc " +
        "FROM documents WHERE doc_id < 300) " +
        "SELECT doc_id, CAST(length(enc) AS BIGINT) AS bpe_tokens, " +
        "CAST(CASE WHEN length(enc) = 0 THEN 0 ELSE " +
        "list_reduce(list_transform(range(1, length(enc) + 1), " +
        "i -> CAST(unicode(substr(enc, i::INT, 1)) AS BIGINT)), " +
        "(a, b) -> (a * 31 + b) % 1000000007) END AS BIGINT) AS seq_hash " +
        "FROM t ORDER BY doc_id"),
    // packing re-budgeted on the replayed BPE counts; plain global
    // running-sum window vs the engine's bucketed prefix sums
    "llm_pack_bpe" ->
      ("WITH t AS (SELECT doc_id, CAST(" +
        graft.functions.Bpe.duckCountSql("lower(text)") +
        " AS INT) AS tokens FROM documents), " +
        "c AS (SELECT doc_id, tokens, sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t) " +
        "SELECT doc_id, CAST(tokens AS BIGINT) AS tokens, " +
        "CAST(floor((cum - tokens) / 512.0) AS BIGINT) AS chunk, " +
        "CAST(cum - tokens - CAST(floor((cum - tokens) / 512.0) AS BIGINT) * 512 AS BIGINT) AS offset " +
        "FROM c ORDER BY doc_id LIMIT 500"),
    // sub-document dedup: corpus-wide keep-first over 10-word chunks via
    // one window; the kept_hash checksum is order-insensitive so a
    // wrong-chunk keep moves it even when counts collide
    "dedup_subdoc" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "c AS (SELECT doc_id, u.idx AS idx, u.chunk AS chunk FROM (" +
        "SELECT doc_id, unnest(list_transform(range(0, CAST(ceil(len(ws) / 10.0) AS INT)), " +
        "i -> {'idx': i, 'chunk': array_to_string(ws[(i*10+1)::INT:(i*10+10)::INT], ' ')})) AS u FROM w)), " +
        "r AS (SELECT doc_id, idx, chunk, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM c) " +
        "SELECT doc_id, count(*) AS n_chunks, " +
        "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "CAST(sum(CASE WHEN rn = 1 THEN ('0x' || substr(md5(chunk), 1, 8))::BIGINT ELSE 0 END) AS BIGINT) AS kept_hash, " +
        "round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS kept_ratio " +
        "FROM r GROUP BY doc_id ORDER BY doc_id"),
    "text_langid" ->
      ("WITH t AS (SELECT lang, text, list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS toks FROM documents), " +
        "p AS (SELECT lang, text, list_max([" +
        "{'score': len(list_intersect(toks, ['der','die','das','und','ist','mit','von','nicht'])), 'lang': 'de'}, " +
        "{'score': len(list_intersect(toks, ['the','and','of','to','in','is','that','with'])), 'lang': 'en'}, " +
        "{'score': len(list_intersect(toks, ['el','la','los','las','de','que','es','con'])), 'lang': 'es'}, " +
        "{'score': len(list_intersect(toks, ['le','la','les','des','est','avec','que','pour'])), 'lang': 'fr'}]) AS best FROM t) " +
        "SELECT lang, CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' WHEN best.score > 0 THEN best.lang ELSE 'und' END AS pred, " +
        "count(*) AS c FROM p GROUP BY 1, 2 ORDER BY 1, 2"),
    "text_fingerprint" ->
      ("SELECT doc_id, list_reduce(list_transform(string_split(text, ' '), tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT % 65536), " +
        "(a, b) -> (a * 31 + b) % 1000000007) AS fp FROM documents ORDER BY doc_id LIMIT 300"),
    // winnow-fingerprint near-dup: stop-fingerprints (>10 docs) dropped,
    // containment = shared / min(|A|,|B|) on the UNROUNDED integer-ratio
    // double (bit-identical across engines); rounded value only displayed
    "dedup_winnow" ->
      ("WITH h AS (SELECT doc_id, i AS pos, ('0x'||substr(md5(substr(text, i::INT, 4)),1,8))::BIGINT AS hv, len(text) AS n " +
        "FROM (SELECT doc_id, text, unnest(range(1, greatest(len(text)-3,0)+1)) AS i FROM documents WHERE doc_id < 120)), " +
        "w AS (SELECT doc_id, pos, n, min(hv) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin FROM h), " +
        "sel0 AS (SELECT DISTINCT doc_id, wmin FROM w WHERE pos <= n - 3 - 4), " +
        "df AS (SELECT wmin, count(*) AS ndocs FROM sel0 GROUP BY 1), " +
        "sel AS (SELECT s.doc_id, s.wmin FROM sel0 s JOIN df USING (wmin) WHERE df.ndocs <= 10), " +
        "cnt AS (SELECT doc_id, count(*) c FROM sel GROUP BY 1), " +
        "p AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) shared FROM sel a JOIN sel b ON a.wmin = b.wmin AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT p.a_id, p.b_id, CAST(p.shared AS BIGINT) AS shared, round(CAST(p.shared AS DOUBLE)/least(ca.c, cb.c), 6) AS sim " +
        "FROM p JOIN cnt ca ON ca.doc_id = p.a_id JOIN cnt cb ON cb.doc_id = p.b_id " +
        "WHERE CAST(p.shared AS DOUBLE)/least(ca.c, cb.c) >= 0.5 ORDER BY a_id, b_id"),
    // winnowing (MOSS): k=4-gram md5 codes, w=5 window minima, DISTINCT
    // minima summarized per doc (count + sum — the set is a list cell).
    // Full windows only: last k-gram position is n-3, last full-window
    // start is n-3-4. sum(BIGINT) is HUGEINT in DuckDB → cast.
    "text_winnow_fingerprint" ->
      ("WITH h AS (SELECT doc_id, i AS pos, ('0x'||substr(md5(substr(text, i::INT, 4)),1,8))::BIGINT AS hv, len(text) AS n " +
        "FROM (SELECT doc_id, text, unnest(range(1, greatest(len(text)-3,0)+1)) AS i FROM documents WHERE doc_id < 50)), " +
        "w AS (SELECT doc_id, pos, n, min(hv) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin FROM h), " +
        "sel AS (SELECT DISTINCT doc_id, wmin FROM w WHERE pos <= n - 3 - 4) " +
        "SELECT doc_id, count(*) AS n_fp, CAST(sum(wmin) AS BIGINT) AS fp_sum FROM sel GROUP BY doc_id ORDER BY doc_id"),
    // BM25 (Okapi, k1=1.2 b=0.75, Lucene +1 idf) for a fixed 4-term
    // query: corpus stats (df/N/avgdl) recomputed from the data, the
    // exact formula replayed operand-for-operand, 4 dp
    "text_bm25" ->
      ("WITH base AS (SELECT doc_id, " +
        "CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS dl, " +
        "CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'table')) AS DOUBLE) AS tf0, " +
        "CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'spark')) AS DOUBLE) AS tf1, " +
        "CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'value')) AS DOUBLE) AS tf2, " +
        "CAST(len(list_filter(string_split(lower(text), ' '), x -> x = 'row')) AS DOUBLE) AS tf3 " +
        "FROM documents), " +
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl, " +
        "sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0, " +
        "sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1, " +
        "sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2, " +
        "sum(CASE WHEN tf3 > 0 THEN 1.0 ELSE 0.0 END) AS df3 FROM base) " +
        "SELECT doc_id, CAST(dl AS BIGINT) AS dl, round(" +
        "ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + " +
        "ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + " +
        "ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + " +
        "ln((n - df3 + 0.5) / (df3 + 0.5) + 1.0) * (tf3 * (1.2 + 1.0)) / (tf3 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))" +
        ", 4) AS bm25 " +
        "FROM base CROSS JOIN stats ORDER BY doc_id"),
    "text_tfidf" ->
      ("WITH terms AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents) " +
        "SELECT t.doc_id, t.term, t.tf, d.df, round(ln((n.n + 1) / (d.df + 1)) + 1, 6) AS idf, " +
        "round(t.tf * (ln((n.n + 1) / (d.df + 1)) + 1), 6) AS tfidf " +
        "FROM tf t JOIN dfq d USING (term) CROSS JOIN n WHERE t.doc_id < 30 ORDER BY t.doc_id, t.term"),
    "dedup_simhash" ->
      ("WITH t AS (SELECT doc_id, list_transform(string_split(text, ' '), tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS codes FROM documents WHERE doc_id < 100), " +
        "s AS (SELECT doc_id, list_reduce(list_transform(range(32), b -> CASE WHEN 2 * len(list_filter(codes, c -> ((c >> b) & 1) = 1)) > len(codes) " +
        "THEN (1::BIGINT << b) ELSE 0::BIGINT END), (a, b) -> a | b) AS sig FROM t) " +
        "SELECT doc_id, sig, CAST(bit_count(sig) AS INT) AS nbits FROM s ORDER BY doc_id"),
    // DuckDB levenshtein returns BIGINT; Spark's is INT — cast to match
    "dedup_levenshtein" ->
      ("WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 40) " +
        "SELECT * FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "CAST(levenshtein(a.text, b.text) AS INT) AS dist " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id) WHERE dist <= 100 ORDER BY a_id, b_id"),
    // oracle uses the plain global running-sum window; the engine's
    // bucketed prefix-sum runningTotal must match it invisibly.
    // len(list) is BIGINT in DuckDB vs Spark size() INT — cast tokens
    "llm_pack_sequences" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS tokens FROM documents), " +
        "c AS (SELECT doc_id, tokens, sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t) " +
        "SELECT doc_id, tokens, CAST(floor((cum - tokens) / 256.0) AS BIGINT) AS chunk, " +
        "CAST(cum - tokens - CAST(floor((cum - tokens) / 256.0) AS BIGINT) * 256 AS BIGINT) AS offset " +
        "FROM c ORDER BY doc_id LIMIT 500"),
    // DuckDB length() is BIGINT; Spark's is INT — cast to match
    "text_normalize" ->
      ("SELECT doc_id, norm, CAST(length(norm) AS INT) AS n_norm FROM " +
        "(SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm " +
        "FROM documents WHERE doc_id < 200) ORDER BY doc_id"),
    "dedup_ngram_jaccard" ->
      ("WITH t AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(text) - 1, 2)), i -> substr(text, i::INT, 3))) AS sh " +
        "FROM documents WHERE doc_id < 40) SELECT * FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id) WHERE jac >= 0.5 ORDER BY a_id, b_id"),
    // asymmetric containment |A∩B|/|A|: exact integer set sizes, one
    // division -> identical doubles, 6-dp round (the jaccard precedent)
    "dedup_containment" ->
      ("WITH t AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(text) - 1, 2)), i -> substr(text, i::INT, 3))) AS sh " +
        "FROM documents WHERE doc_id < 40) SELECT * FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "len(a.sh) AS n_a, len(list_intersect(a.sh, b.sh)) AS inter, " +
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS cont " +
        "FROM t a JOIN t b ON a.doc_id <> b.doc_id) WHERE cont >= 0.8 ORDER BY a_id, b_id"),
    "dedup_embedding" ->
      ("WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id < 120) " +
        "SELECT * FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id, round(list_cosine_similarity(a.v, b.v), 6) AS cosine " +
        "FROM t a JOIN t b ON a.vec_id < b.vec_id) WHERE cosine >= 0.3 ORDER BY a_id, b_id"),
    // prefix dedup: first-8-token prologue groups keyed by md5 (the
    // cross-engine hash convention); keeper = min doc id
    "dedup_prefix" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
        "p AS (SELECT doc_id, md5(array_to_string(tk[1:8], ' ')) AS pm FROM t WHERE len(tk) >= 8) " +
        "SELECT pm AS prefix_md5, CAST(min(doc_id) AS BIGINT) AS keeper, CAST(count(*) AS BIGINT) AS n_docs " +
        "FROM p GROUP BY pm HAVING count(*) >= 2 ORDER BY prefix_md5"),
    // DSIR importance weights: data-estimated bucket models (add-1),
    // per-token ln terms operand-identical, the one order-sensitive
    // per-doc float fold rounded at 4 dp (text_char_entropy precedent)
    "llm_dsir_weight" ->
      ("WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents), " +
        "tb AS (SELECT doc_id, lang, " +
        "('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b FROM toks), " +
        "counts AS (SELECT b, " +
        "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct, " +
        "CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs " +
        "FROM tb GROUP BY b) " +
        "SELECT t.doc_id, t.lang, CAST(count(*) AS BIGINT) AS n_tok, " +
        "round(sum(ln(ct + 1) - ln(cs + 1)), 4) AS dsir_w, " +
        "(t.lang = 'en') AS is_target " +
        "FROM tb t JOIN counts c ON t.b = c.b " +
        "GROUP BY t.doc_id, t.lang ORDER BY t.doc_id"),
    // fastText-style classifier inference: hashed unigram+bigram
    // features on the md5 weight lattice, integer sums, the mean's two
    // chained float divisions operand-identical on both engines
    "llm_quality_classifier" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk " +
        "FROM documents WHERE len(string_split(text, ' ')) >= 2), " +
        "f AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok, " +
        "CAST(list_sum(list_transform(tk, " +
        "t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % 2001 - 1000)) AS BIGINT) AS uni, " +
        "CAST(list_sum(list_transform(generate_series(1, len(tk) - 1), " +
        "i -> ('0x' || substr(md5(tk[i] || ' ' || tk[i+1]), 1, 8))::BIGINT % 2001 - 1000)) AS BIGINT) AS bg " +
        "FROM w) " +
        "SELECT doc_id, (2 * n_tok - 1) AS n_feats, (uni + bg) AS score_milli, " +
        "round((uni + bg) / CAST(2 * n_tok - 1 AS DOUBLE) / 1000.0, 6) AS score, " +
        "(uni + bg) > 0 AS label FROM f ORDER BY doc_id"),
    // C4 line-level cleaning: the closed-form multi-line corpus is a
    // key function both engines rebuild; every rule arm (terminal
    // punctuation, >=5 words, javascript, lorem-ipsum / brace page
    // poison, >=3 surviving lines) is exercised by a template
    // C4 three-sentence-span dedup: overlapping spans via two leads, a
    // sentence is removed when any non-first span covers it — the
    // oracle replays span formation, keep-first and coverage exactly
    "dedup_c4_spans" ->
      ("WITH t AS (SELECT p_partkey AS k, (p_partkey % 7) AS site " +
        "FROM part WHERE p_partkey <= 300), " +
        "s AS (" +
        "SELECT k, 0 AS pos, 'intro ' || k || ' alpha ' || ((k * 7) % 9973) || '.' AS line FROM t " +
        "UNION ALL SELECT k, 1, 'share a ' || site || '.' FROM t " +
        "UNION ALL SELECT k, 2, 'share b ' || site || '.' FROM t " +
        "UNION ALL SELECT k, 3, 'share c ' || site || '.' FROM t " +
        "UNION ALL SELECT k, 4, 'outro ' || k || ' beta ' || ((k * 11) % 9973) || '.' FROM t), " +
        "sp0 AS (SELECT k, pos, line || ' ' || " +
        "lead(line, 1) OVER (PARTITION BY k ORDER BY pos) || ' ' || " +
        "lead(line, 2) OVER (PARTITION BY k ORDER BY pos) AS span, " +
        "lead(line, 2) OVER (PARTITION BY k ORDER BY pos) AS s2 FROM s), " +
        "sp AS (SELECT k, pos, span FROM sp0 WHERE s2 IS NOT NULL), " +
        "r AS (SELECT k, pos, " +
        "row_number() OVER (PARTITION BY span ORDER BY k, pos) AS rn FROM sp), " +
        "rem AS (SELECT DISTINCT r.k, r.pos + d.i AS pos " +
        "FROM r, (VALUES (0), (1), (2)) AS d(i) WHERE r.rn > 1), " +
        "o AS (SELECT s.k, s.pos, s.line, rem.pos IS NOT NULL AS removed " +
        "FROM s LEFT JOIN rem ON s.k = rem.k AND s.pos = rem.pos) " +
        "SELECT k, CAST(count(*) AS BIGINT) AS n_sentences, " +
        "CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
        "coalesce(string_agg(CASE WHEN NOT removed THEN line END, ' ' ORDER BY pos), '') AS text_clean " +
        "FROM o GROUP BY k ORDER BY k"),
    // global line-level dedup (CCNet boilerplate pass): a line is kept
    // only at its first corpus-wide (doc, pos) occurrence; the oracle
    // replays keep-first with a row_number window — a wrong keeper,
    // lost unique line, or mis-ordered reassembly moves
    // n_kept/text_kept
    "text_line_dedup" ->
      ("WITH t AS (SELECT p_partkey AS k, (p_partkey % 7) AS site " +
        "FROM part WHERE p_partkey <= 300), " +
        "l AS (" +
        "SELECT k, 0 AS pos, 'Home | About | Contact - site-' || site AS line FROM t " +
        "UNION ALL SELECT k, 1, 'welcome to site ' || site || ' page' FROM t " +
        "UNION ALL SELECT k, 2, 'unique content ' || k || ' alpha ' || ((k * 17) % 9973) FROM t " +
        "UNION ALL SELECT k, 3, 'body text ' || k || ' beta ' || ((k * 29) % 9973) FROM t " +
        "UNION ALL SELECT k, 4, 'copyright site-' || site FROM t " +
        "UNION ALL SELECT k, 5, 'subscribe to our newsletter' FROM t WHERE k % 3 = 0), " +
        "r AS (SELECT k, pos, line, " +
        "row_number() OVER (PARTITION BY line ORDER BY k, pos) AS rn FROM l) " +
        "SELECT k, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos), '') AS text_kept " +
        "FROM r GROUP BY k ORDER BY k"),
    "text_c4_filter" ->
      ("WITH t AS (SELECT p_partkey AS k, (p_partkey % 6) + 4 AS m " +
        "FROM part WHERE p_partkey <= 200), " +
        "l0 AS (SELECT k, list_transform(generate_series(0, m - 1), " +
        "j -> CASE (k * 3 + j) % 7 " +
        "WHEN 0 THEN 'page ' || k || ' part ' || j || ' carries several useful words.' " +
        "WHEN 1 THEN 'section ' || j || ' of page ' || k || ' reads cleanly today.' " +
        "WHEN 2 THEN 'entry ' || j || ' on page ' || k || ' closes with punctuation!' " +
        "WHEN 3 THEN 'does line ' || j || ' of page ' || k || ' end with a question?' " +
        "WHEN 4 THEN 'dangling line ' || j || ' on page ' || k || ' never ends' " +
        "WHEN 5 THEN 'please enable javascript to view item ' || j || '.' " +
        "ELSE 'tiny note ' || j || '.' END) AS base FROM t), " +
        "l AS (SELECT k, base || " +
        "CASE WHEN k % 37 = 0 THEN ['lorem ipsum dolor sit amet.'] " +
        "ELSE CAST([] AS VARCHAR[]) END || " +
        "CASE WHEN k % 41 = 0 THEN ['config { value: ' || k || ' }.'] " +
        "ELSE CAST([] AS VARCHAR[]) END AS lines FROM l0), " +
        "f AS (SELECT k, lines, " +
        "list_filter(lines, x -> regexp_matches(x, '[.!?\"]$') " +
        "AND len(string_split(x, ' ')) >= 5 " +
        "AND NOT contains(x, 'javascript')) AS kept, " +
        "len(list_filter(lines, x -> contains(x, 'lorem ipsum') " +
        "OR contains(x, '{'))) > 0 AS poisoned FROM l) " +
        "SELECT k, CAST(len(lines) AS BIGINT) AS n_lines, " +
        "CAST(len(kept) AS BIGINT) AS n_kept, " +
        "(NOT poisoned AND len(kept) >= 3) AS page_kept, " +
        "CASE WHEN NOT poisoned AND len(kept) >= 3 " +
        "THEN array_to_string(kept, ' | ') ELSE NULL END AS clean_text " +
        "FROM f ORDER BY k"),
    // Gopher document-quality gate: the four public MassiveText rules
    // in exact integer basis points; the top-bigram mode is rank-1
    // with a lexicographic tie-break so both engines pick the same
    // bigram deterministically
    "text_gopher_quality" ->
      ("WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS tk " +
        "FROM documents WHERE len(string_split(text, ' ')) >= 2), " +
        "base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(len(tk) AS BIGINT) AS n_words, " +
        "CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) AS word_chars, " +
        "CAST(len(list_filter(tk, x -> x IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop_n " +
        "FROM w), " +
        "bgl AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1), " +
        "i -> tk[i] || ' ' || tk[i+1])) AS bg FROM w), " +
        "cnt AS (SELECT doc_id, bg, count(*) AS n FROM bgl GROUP BY 1, 2), " +
        "top AS (SELECT doc_id, bg AS top_bg, n AS top_bg_n FROM " +
        "(SELECT doc_id, bg, n, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY n DESC, bg ASC) AS rn FROM cnt) WHERE rn = 1), " +
        "j AS (SELECT b.doc_id, n_words, " +
        "CAST((10000 * word_chars) // n_words AS BIGINT) AS mean_len_bp, " +
        "stop_n, top_bg, CAST(top_bg_n AS BIGINT) AS top_bg_n, " +
        "CAST((10000 * top_bg_n * length(top_bg)) // n_chars AS BIGINT) AS top_frac_bp " +
        "FROM base b JOIN top t ON b.doc_id = t.doc_id) " +
        "SELECT doc_id, n_words, mean_len_bp, stop_n, top_bg, top_bg_n, top_frac_bp, " +
        "(n_words BETWEEN 50 AND 100000 AND mean_len_bp BETWEEN 30000 AND 100000 " +
        "AND stop_n >= 2 AND top_frac_bp <= 2000) AS keep " +
        "FROM j ORDER BY doc_id"),
    // Gopher-style duplicate-bigram fraction: adjacent-pair lambdas
    // (1-based on both engines), dup share half-up-rounded to basis
    // points in pure integer arithmetic -- no float anywhere
    "text_repetition" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents), " +
        "b AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, " +
        "list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1]) AS bg " +
        "FROM t WHERE len(tk) >= 2) " +
        "SELECT doc_id, n_tokens, CAST(len(bg) AS BIGINT) AS n_bigrams, " +
        "CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct, " +
        "(20000 * (len(bg) - len(list_distinct(bg))) + len(bg)) // (2 * len(bg)) AS dup_bp " +
        "FROM b ORDER BY doc_id"),
    // per-character Shannon entropy: exact integer counts, per-row
    // operand-identical cnt·ln(cnt), ONE order-sensitive float sum
    // (~tens of character classes, ~1e-15 relative) rounded at 4 dp —
    // the text_unigram_logprob precedent
    "text_char_entropy" ->
      ("WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents WHERE doc_id < 500), " +
        "g AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars, count(*) AS n_distinct, " +
        "round(ln(CAST(sum(cnt) AS DOUBLE)) - sum(cnt * ln(CAST(cnt AS DOUBLE))) / CAST(sum(cnt) AS DOUBLE), 4) AS entropy " +
        "FROM g GROUP BY doc_id ORDER BY doc_id"),
    "text_unigram_logprob" ->
      "WITH tok AS (SELECT doc_id, unnest(split(text, ' ')) AS w FROM documents), freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w), tot AS (SELECT count(*) AS n FROM tok) SELECT t.doc_id, count(*) AS n_tokens, round(avg(ln(f.c / tot.n)), 4) AS avg_ll FROM tok t JOIN freq f ON t.w = f.w CROSS JOIN tot GROUP BY t.doc_id ORDER BY t.doc_id",
    // add-one-smoothed bigram LM under the corpus's own statistics —
    // the context-aware sibling of text_unigram_logprob (range bound 400
    // > the max ~100 tokens/doc, same pattern as llm_ngrams)
    "llm_bigram_logprob" ->
      "WITH toks AS (SELECT doc_id, string_split(text,' ') l FROM documents), uni AS (SELECT u.w, count(*) c FROM (SELECT unnest(l) w FROM toks) u(w) GROUP BY 1), vocab AS (SELECT count(*) v FROM uni), bg AS (SELECT doc_id, l[i] w1, l[i+1] w2 FROM toks, range(1, 400) r(i) WHERE i < len(l)), bgc AS (SELECT w1, w2, count(*) c2 FROM bg GROUP BY 1, 2) SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, round(avg(ln((bgc.c2 + 1.0) / (uni.c + vocab.v))), 6) AS avg_lp FROM bg b JOIN bgc ON b.w1 = bgc.w1 AND b.w2 = bgc.w2 JOIN uni ON b.w1 = uni.w CROSS JOIN vocab GROUP BY b.doc_id ORDER BY b.doc_id",
    "llm_chunk_text" ->
      "SELECT doc_id, pos, substr(text, CAST(pos AS INT), 100) AS chunk FROM (SELECT doc_id, text, unnest(generate_series(1, len(text), 80)) AS pos FROM documents WHERE doc_id < 50) ORDER BY doc_id, pos",
    // transitive-closure min propagation reaches the same fixpoint as the
    // engine's large-star/small-star contraction: both label every node
    // with the minimum id of its component
    "dedup_cc_clusters" ->
      ("WITH RECURSIVE pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id < 120) a " +
        "JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id < 120) b " +
        "ON a.vec_id < b.vec_id WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3), " +
        "nodes AS (SELECT DISTINCT id FROM (SELECT a_id AS id FROM pairs UNION SELECT b_id FROM pairs)), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT id, id FROM nodes UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u) " +
        "SELECT u AS id, min(v) AS cluster_id FROM reach GROUP BY u ORDER BY id"),
    "hrv_clean_interp" ->
      ("WITH f AS (SELECT event_id, user_id, ts, value, " +
        "(value < 1.0 OR value > 300.0 OR abs(value - coalesce(quantile_cont(value, 0.5) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), value)) > " +
        "abs(coalesce(quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), value)) * 2.0) AS is_outlier FROM events), " +
        "c AS (SELECT event_id, user_id, ts, value, is_outlier, CASE WHEN is_outlier THEN NULL ELSE value END AS cv FROM f), " +
        "n AS (SELECT event_id, value, is_outlier, " +
        "last_value(cv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc, " +
        "first_value(cv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc FROM c) " +
        "SELECT event_id, is_outlier, round(CASE WHEN NOT is_outlier THEN value " +
        "WHEN pc IS NOT NULL AND nc IS NOT NULL THEN (pc + nc) / 2 " +
        "ELSE coalesce(pc, nc, value) END, 4) AS value_clean FROM n ORDER BY event_id LIMIT 1000"),
    // cent-lattice exact variance moments (round-11): see hrv_rmssd
    "hrv_poincare" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, ts, event_id FROM events), " +
        "p AS (SELECT user_id, c - lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d, " +
        "c + lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s FROM b) " +
        "SELECT user_id AS series_key, " +
        "round(CASE WHEN count(d) > 1 THEN sqrt(CAST(count(d) * sum(d * d) - sum(d) * sum(d) AS DOUBLE) / (count(d) * (count(d) - 1) * 2)) / 100.0 END, 2) AS sd1, " +
        "round(CASE WHEN count(d) > 1 THEN sqrt(CAST(count(d) * sum(s * s) - sum(s) * sum(s) AS DOUBLE) / (count(d) * (count(d) - 1) * 2)) / 100.0 END, 2) AS sd2, " +
        "round(CASE WHEN count(d) > 1 AND count(d) * sum(d * d) - sum(d) * sum(d) > 0 THEN (sqrt(CAST(count(d) * sum(s * s) - sum(s) * sum(s) AS DOUBLE) / (count(d) * (count(d) - 1) * 2)) / 100.0) / (sqrt(CAST(count(d) * sum(d * d) - sum(d) * sum(d) AS DOUBLE) / (count(d) * (count(d) - 1) * 2)) / 100.0) END, 2) AS sd_ratio " +
        "FROM p WHERE d IS NOT NULL GROUP BY user_id ORDER BY series_key"),
    // `+ 0` normalizes IEEE negative zero: DuckDB's round can emit -0.0
    // for values like -1e-18 where Spark's BigDecimal round emits 0.0
    // (first observed at sf1 — round-11); +0 maps -0.0 to 0.0 and is the
    // identity everywhere else (incl. NULL). Applied to every rounded
    // output that can be negative-near-zero.
    // cross-correlation of two per-user daily series from exact integer
    // moments — the agg_corr recipe: cents-lattice purchase totals,
    // integer click counts, one float division over operand-identical
    // exact integers, round 4 dp off-lattice, + 0 kills -0.0
    "ts_cross_corr" ->
      ("WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "coalesce(CAST(sum(CAST(round(value*100) AS BIGINT)) FILTER (WHERE event_type = 'purchase') AS BIGINT), 0) AS pc, " +
        "count(*) FILTER (WHERE event_type = 'click') AS cc " +
        "FROM events GROUP BY 1, 2), " +
        "g AS (SELECT user_id, count(*) AS n, CAST(sum(pc) AS BIGINT) AS sp, CAST(sum(cc) AS BIGINT) AS sc, " +
        "CAST(sum(pc*cc) AS BIGINT) AS spc, CAST(sum(pc*pc) AS BIGINT) AS spp, CAST(sum(cc*cc) AS BIGINT) AS scc FROM d GROUP BY user_id) " +
        "SELECT user_id, n AS n_days, CASE WHEN n*spp - sp*sp > 0 AND n*scc - sc*sc > 0 " +
        "THEN round(CAST(n*spc - sp*sc AS DOUBLE) / (sqrt(CAST(n*spp - sp*sp AS DOUBLE)) * sqrt(CAST(n*scc - sc*sc AS DOUBLE))), 4) + 0 END AS xcorr " +
        "FROM g ORDER BY user_id"),
    "agg_corr" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events), " +
        "g AS (SELECT user_id, count(*) AS n, sum(c) AS sc, sum(k) AS sk, sum(c * k) AS sck, sum(c * c) AS scc, sum(k * k) AS skk FROM b GROUP BY user_id) " +
        "SELECT user_id, " +
        "CASE WHEN n * scc - sc * sc > 0 AND n * skk - sk * sk > 0 THEN round(CAST(n * sck - sc * sk AS DOUBLE) / (sqrt(CAST(n * scc - sc * sc AS DOUBLE)) * sqrt(CAST(n * skk - sk * sk AS DOUBLE))), 4) + 0 END AS corr_vk, " +
        "CASE WHEN n > 1 THEN CAST(CASE WHEN n * sck - sc * sk >= 0 THEN (2 * (n * sck - sc * sk) + n * (n - 1)) // (2 * n * (n - 1)) ELSE -((2 * (sc * sk - n * sck) + n * (n - 1)) // (2 * n * (n - 1))) END AS DOUBLE) / 100.0 END AS covar_vk " +
        "FROM g ORDER BY user_id"),
    // linear-interp resampling: per-tick backward+forward brackets via
    // LATERAL (the engine runs two native sorted-merge as-of passes),
    // then EXACT integer interpolation — (c0·(t1−tk) + c1·(tk−t0)) over
    // (t1−t0) half-ups onto the cent grid in pure integer arithmetic;
    // tie rules: backward takes max cent at an exact instant, forward
    // min cent; a tick ON a sample (t1 = t0) takes the backward value
    "hrv_resample_interp" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS tm, CAST(round(value * 100) AS BIGINT) AS c FROM events WHERE user_id < 5 AND value IS NOT NULL), " +
        "bnd AS (SELECT user_id, epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx FROM events WHERE user_id < 5 GROUP BY 1), " +
        "ticks AS (SELECT user_id, unnest(range(mn, mx + 1, 3600000000)) AS tk FROM bnd), " +
        "j AS (SELECT t.user_id, t.tk, bb.tm AS bt, bb.c AS bc, ff.tm AS ft, ff.c AS fc FROM ticks t " +
        "JOIN LATERAL (SELECT tm, c FROM e WHERE e.user_id = t.user_id AND e.tm <= t.tk ORDER BY tm DESC, c DESC LIMIT 1) bb ON true " +
        "JOIN LATERAL (SELECT tm, c FROM e WHERE e.user_id = t.user_id AND e.tm >= t.tk ORDER BY tm ASC, c ASC LIMIT 1) ff ON true) " +
        "SELECT user_id AS series_key, make_timestamp(tk) AS ts, " +
        "CAST(CASE WHEN ft = bt THEN bc ELSE (2 * (bc * (ft - tk) + fc * (tk - bt)) + (ft - bt)) // (2 * (ft - bt)) END AS DOUBLE) / 100.0 AS value_interp " +
        "FROM j ORDER BY series_key, ts"),
    "hrv_resample" ->
      ("WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id < 5), " +
        "b AS (SELECT user_id, epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM e GROUP BY 1), " +
        "ticks AS (SELECT user_id, unnest(range(t0, t1 + 1, 3600000000)) AS tm FROM b), " +
        "u AS (SELECT user_id, tm, CAST(NULL AS DOUBLE) AS v, 1 AS is_tick FROM ticks " +
        "UNION ALL SELECT user_id, epoch_us(ts) AS tm, value AS v, 0 AS is_tick FROM e), " +
        "w AS (SELECT user_id, tm, is_tick, last_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY tm, is_tick, v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vr FROM u) " +
        "SELECT user_id AS series_key, make_timestamp(tm) AS ts, vr AS value_resampled " +
        "FROM w WHERE is_tick = 1 ORDER BY series_key, ts"),
    // integer-CENT lattice (round-11 sf1 lesson): float avg/sqrt sums
    // landed ON a 2-dp boundary at 10× scale; on cents every aggregate
    // is exact and the one float step per output is operand-identical
    // on both engines
    // Lorenz-plot indices off the hrv_poincare cent-lattice descriptors:
    // identical sd1/sd2 float chains, then csi = sd2/sd1,
    // cvi = log10(sd1*sd2*16), modified_csi = sd2*sd2*4/sd1 — all
    // irrational, 4-dp round safe; +0 kills DuckDB's -0.0 on cvi
    // rolling Pearson over the trailing 30 events: every frame moment
    // is an exact integer window sum; one float chain per row (+0
    // kills DuckDB's -0.0); frames under 10 rows or degenerate
    // variance are null
    "win_rolling_corr" ->
      ("WITH b AS (SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events WHERE user_id < 40), " +
        "m AS (SELECT user_id, event_id, count(*) OVER w AS n, " +
        "CAST(sum(c) OVER w AS BIGINT) AS sc, CAST(sum(k) OVER w AS BIGINT) AS sk, " +
        "CAST(sum(c * k) OVER w AS BIGINT) AS sck, CAST(sum(c * c) OVER w AS BIGINT) AS scc, CAST(sum(k * k) OVER w AS BIGINT) AS skk " +
        "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id AS series_key, event_id, " +
        "CASE WHEN n >= 10 AND n * scc - sc * sc > 0 AND n * skk - sk * sk > 0 " +
        "THEN round(CAST(n * sck - sc * sk AS DOUBLE) / (sqrt(CAST(n * scc - sc * sc AS DOUBLE)) * sqrt(CAST(n * skk - sk * sk AS DOUBLE))), 4) + 0 END AS corr_30 " +
        "FROM m ORDER BY series_key, event_id"),
    "hrv_csi_cvi" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, ts, event_id FROM events), " +
        "p AS (SELECT user_id, c - lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d, " +
        "c + lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s FROM b), " +
        "m AS (SELECT user_id, count(d) AS n, CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d*d) AS BIGINT) AS sdd, " +
        "CAST(sum(s) AS BIGINT) AS ss, CAST(sum(s*s) AS BIGINT) AS sss FROM p WHERE d IS NOT NULL GROUP BY user_id), " +
        "v AS (SELECT user_id, CASE WHEN n > 1 THEN sqrt(CAST(n * sdd - sd * sd AS DOUBLE) / (n * (n - 1) * 2)) / 100.0 END AS sd1, " +
        "CASE WHEN n > 1 THEN sqrt(CAST(n * sss - ss * ss AS DOUBLE) / (n * (n - 1) * 2)) / 100.0 END AS sd2 FROM m) " +
        "SELECT user_id AS series_key, " +
        "CASE WHEN sd1 > 0 THEN round(sd2 / sd1, 4) + 0 END AS csi, " +
        "CASE WHEN sd1 > 0 AND sd2 > 0 THEN round(log10(sd1 * sd2 * 16), 4) + 0 END AS cvi, " +
        "CASE WHEN sd1 > 0 THEN round(sd2 * sd2 * 4 / sd1, 4) + 0 END AS modified_csi " +
        "FROM v ORDER BY series_key"),
    // all-integer triangular index; HTI is a RATIONAL count ratio →
    // integer half-up on the 4-dp grid ((2p+q) div (2q)), never a
    // float round
    "hrv_geometry" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) // 800 AS bin FROM events), " +
        "g AS (SELECT user_id, bin, count(*) AS cnt FROM b GROUP BY 1, 2), " +
        "a AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n, max(cnt) AS mx, count(*) AS nb FROM g GROUP BY user_id) " +
        "SELECT user_id AS series_key, n, nb AS n_bins, mx AS max_bin_count, " +
        "CAST((2 * (n * 10000) + mx) // (2 * mx) AS DOUBLE) / 10000.0 AS hti " +
        "FROM a ORDER BY series_key"),
    // TINN: separable brute-force argmin over the dense bin grid inside
    // the histogram support; side errors are EXACT int64 numerators
    // e_num/d^2, both engines divide identical int64s -> identical
    // doubles -> identical (error, candidate) ordering; peak ties break
    // to the lowest bin in both engines
    "hrv_tinn" ->
      ("WITH bs AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) // 800 AS bin FROM events), " +
        "g AS (SELECT user_id, bin, count(*) AS cnt FROM bs GROUP BY 1, 2), " +
        "pk AS (SELECT user_id, bin AS x, cnt AS y FROM (SELECT user_id, bin, cnt, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, bin ASC) AS rn FROM g) WHERE rn = 1), " +
        "s AS (SELECT g.user_id AS user_id, min(g.bin) AS minb, max(g.bin) AS maxb, CAST(sum(g.cnt) AS BIGINT) AS n, min(pk.x) AS x, min(pk.y) AS y FROM g JOIN pk USING (user_id) GROUP BY g.user_id), " +
        "grid AS (SELECT e.user_id, e.x, e.y, e.bb, coalesce(g.cnt, 0) AS d FROM (SELECT user_id, x, y, unnest(generate_series(minb, maxb)) AS bb FROM s) e LEFT JOIN g ON e.user_id = g.user_id AND e.bb = g.bin), " +
        "lc AS (SELECT user_id, unnest(generate_series(minb, x - 1)) AS cand FROM s WHERE x > minb), " +
        "le AS (SELECT lc.user_id, lc.cand, sum(CASE WHEN grid.bb < lc.cand THEN (grid.d * (grid.x - lc.cand)) * (grid.d * (grid.x - lc.cand)) ELSE (grid.d * (grid.x - lc.cand) - grid.y * (grid.bb - lc.cand)) * (grid.d * (grid.x - lc.cand) - grid.y * (grid.bb - lc.cand)) END) AS e_num, min(grid.x - lc.cand) AS dd FROM lc JOIN grid ON lc.user_id = grid.user_id AND grid.bb < grid.x GROUP BY 1, 2), " +
        "lsel AS (SELECT user_id, cand AS n_left FROM (SELECT user_id, cand, row_number() OVER (PARTITION BY user_id ORDER BY CAST(e_num AS DOUBLE) / CAST(dd * dd AS DOUBLE), cand) AS rn FROM le) WHERE rn = 1), " +
        "rc AS (SELECT user_id, unnest(generate_series(x + 1, maxb)) AS cand FROM s WHERE x < maxb), " +
        "re AS (SELECT rc.user_id, rc.cand, sum(CASE WHEN grid.bb > rc.cand THEN (grid.d * (rc.cand - grid.x)) * (grid.d * (rc.cand - grid.x)) ELSE (grid.d * (rc.cand - grid.x) - grid.y * (rc.cand - grid.bb)) * (grid.d * (rc.cand - grid.x) - grid.y * (rc.cand - grid.bb)) END) AS e_num, min(rc.cand - grid.x) AS dd FROM rc JOIN grid ON rc.user_id = grid.user_id AND grid.bb > grid.x GROUP BY 1, 2), " +
        "rsel AS (SELECT user_id, cand AS m_right FROM (SELECT user_id, cand, row_number() OVER (PARTITION BY user_id ORDER BY CAST(e_num AS DOUBLE) / CAST(dd * dd AS DOUBLE), cand) AS rn FROM re) WHERE rn = 1) " +
        "SELECT s.user_id AS series_key, s.n, s.x AS peak_bin, " +
        "coalesce(l.n_left, s.x) AS n_left, coalesce(r.m_right, s.x) AS m_right, " +
        "CAST(coalesce(r.m_right, s.x) - coalesce(l.n_left, s.x) AS DOUBLE) * 8.0 AS tinn " +
        "FROM s LEFT JOIN lsel l USING (user_id) LEFT JOIN rsel r USING (user_id) ORDER BY series_key"),
    // median of integers interpolates exactly (half-integer at worst);
    // the per-sample inverse rate lands on its own integer centi-grid
    // via half-up BEFORE aggregating; CVs are irrational ratios of
    // operand-identical doubles (4-dp float round safe)
    "hrv_time_extras" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, " +
        "CAST(round(value * 100) AS BIGINT) - lag(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dc " +
        "FROM events), " +
        "h AS (SELECT user_id, c, dc, CASE WHEN c > 0 THEN (2 * 600000 + c) // (2 * c) END AS hr FROM b) " +
        "SELECT user_id AS series_key, count(c) AS n, " +
        "quantile_cont(c, 0.5) / 100.0 AS median_nn, " +
        "CAST(max(c) - min(c) AS DOUBLE) / 100.0 AS range_nn, " +
        "CASE WHEN count(c) > 1 THEN round(sqrt(CAST(count(c) * sum(c * c) - sum(c) * sum(c) AS DOUBLE) / (count(c) * (count(c) - 1))) / (CAST(sum(c) AS DOUBLE) / count(c)), 4) END AS cvnni, " +
        "CASE WHEN count(dc) > 0 THEN round(sqrt(CAST(sum(dc * dc) AS DOUBLE) / count(dc)) / (CAST(sum(c) AS DOUBLE) / count(c)), 4) END AS cvsd, " +
        "CASE WHEN count(hr) > 0 THEN CAST((2 * sum(hr) + count(hr)) // (2 * count(hr)) AS DOUBLE) / 100.0 END AS mean_hr, " +
        "CAST(min(hr) AS DOUBLE) / 100.0 AS min_hr, " +
        "CAST(max(hr) AS DOUBLE) / 100.0 AS max_hr " +
        "FROM h GROUP BY user_id ORDER BY series_key"),
    // Malik / Kamath thresholds cross-multiplied into exact integer
    // compares (|d|*5 > p ⟺ |d| > 0.2p; d*40 > 13p ⟺ d > 0.325p;
    // -d*200 > 49p ⟺ -d > 0.245p); fraction integer-rounded at 4 dp
    "hrv_ectopic" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, " +
        "lag(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p FROM events), " +
        "f AS (SELECT user_id, CASE WHEN abs(c - p) * 5 > p THEN 1 ELSE 0 END AS malik, " +
        "CASE WHEN (c - p) * 40 > p * 13 OR (p - c) * 200 > p * 49 THEN 1 ELSE 0 END AS kamath " +
        "FROM b WHERE p IS NOT NULL) " +
        "SELECT user_id AS series_key, count(*) AS n_pairs, " +
        "CAST(sum(malik) AS BIGINT) AS n_malik, CAST(sum(kamath) AS BIGINT) AS n_kamath, " +
        "CASE WHEN count(*) > 0 THEN CAST((2 * (sum(malik) * 10000) + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0 END AS pct_malik " +
        "FROM f GROUP BY user_id ORDER BY series_key"),
    // per-sample trailing-60 RMSSD: exact integer frame sums, one
    // float division + sqrt per row (irrational → 2-dp round safe)
    "hrv_rolling_rmssd" ->
      ("WITH b AS (SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS c FROM events WHERE user_id < 40), " +
        "d AS (SELECT user_id, event_id, ts, c - lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dc FROM b), " +
        "r AS (SELECT user_id, event_id, " +
        "CAST(sum(dc * dc) OVER w AS BIGINT) AS sq, count(dc) OVER w AS cnt FROM d " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id AS series_key, event_id, " +
        "CASE WHEN cnt > 0 THEN round(sqrt(CAST(sq AS DOUBLE) / cnt) / 100.0, 2) END AS rmssd_60 " +
        "FROM r ORDER BY series_key, event_id"),
    // SDANN / SDNN-index on daily segments: per-segment mean half-ups
    // onto the cent grid, per-segment SDNN quantizes via
    // floor(sqrt + 0.5) of an operand-identical IEEE sqrt — the
    // second-level aggregates are exact integer moments again, so
    // neither engine ever sums floats
    "hrv_sdann" ->
      ("WITH b AS (SELECT user_id, date_trunc('day', ts) AS seg, CAST(round(value * 100) AS BIGINT) AS c FROM events), " +
        "g AS (SELECT user_id, seg, count(*) AS n, CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q FROM b GROUP BY 1, 2), " +
        "f AS (SELECT user_id, (2 * s + n) // (2 * n) AS mc, " +
        "CASE WHEN n > 1 THEN CAST(floor(sqrt(CAST(n * q - s * s AS DOUBLE) / (n * (n - 1))) + 0.5) AS BIGINT) END AS sc FROM g) " +
        "SELECT user_id AS series_key, count(mc) AS n_segments, count(sc) AS n_sdnn_segments, " +
        "CASE WHEN count(mc) > 1 THEN round(sqrt(CAST(count(mc) * sum(mc * mc) - sum(mc) * sum(mc) AS DOUBLE) / (count(mc) * (count(mc) - 1))) / 100.0, 2) END AS sdann, " +
        "CASE WHEN count(sc) > 0 THEN CAST((2 * sum(sc) + count(sc)) // (2 * count(sc)) AS DOUBLE) / 100.0 END AS sdnn_index " +
        "FROM f GROUP BY user_id ORDER BY series_key"),
    // the fused feature table: one window + one aggregate computing
    // every canonical feature with the IDENTICAL formulas the
    // single-feature oracles use — the oracle proves the fusion is
    // result-invisible
    "hrv_feature_table" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, ts, event_id FROM events), " +
        "p AS (SELECT user_id, c, c - lag(c) OVER win AS dc, c + lag(c) OVER win AS sc FROM b WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT user_id, count(c) AS n, CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q, " +
        "count(dc) AS nd, CAST(sum(dc) AS BIGINT) AS sd, CAST(sum(dc * dc) AS BIGINT) AS sdd, " +
        "CAST(sum(sc) AS BIGINT) AS ss, CAST(sum(sc * sc) AS BIGINT) AS sss, " +
        "CAST(sum(CASE WHEN abs(dc) > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS np FROM p GROUP BY user_id), " +
        "v AS (SELECT user_id, n, s, q, nd, sdd, np, " +
        "CASE WHEN nd > 1 THEN sqrt(CAST(nd * sdd - sd * sd AS DOUBLE) / (nd * (nd - 1) * 2)) / 100.0 END AS sd1x, " +
        "CASE WHEN nd > 1 THEN sqrt(CAST(nd * sss - ss * ss AS DOUBLE) / (nd * (nd - 1) * 2)) / 100.0 END AS sd2x, " +
        "CASE WHEN nd > 1 AND nd * sdd - sd * sd > 0 THEN 1 ELSE 0 END AS ok1, " +
        "CASE WHEN nd > 1 AND nd * sss - ss * ss > 0 THEN 1 ELSE 0 END AS ok2 FROM g) " +
        "SELECT user_id AS series_key, n, " +
        "CAST((2 * s + n) // (2 * n) AS DOUBLE) / 100.0 AS mean_nn, " +
        "round(CASE WHEN n > 1 THEN sqrt(CAST(n * q - s * s AS DOUBLE) / (n * (n - 1))) / 100.0 END, 2) AS sdnn, " +
        "round(CASE WHEN nd > 0 THEN sqrt(CAST(sdd AS DOUBLE) / nd) / 100.0 END, 2) AS rmssd, " +
        "CASE WHEN nd > 0 THEN CAST((2 * (np * 10000) + nd) // (2 * nd) AS DOUBLE) / 10000.0 END AS pnn, " +
        "round(sd1x, 2) AS sd1, round(sd2x, 2) AS sd2, " +
        "CASE WHEN ok1 = 1 THEN round(sd2x / sd1x, 4) + 0 END AS csi, " +
        "CASE WHEN ok1 = 1 AND ok2 = 1 THEN round(log10(sd1x * sd2x * 16), 4) + 0 END AS cvi, " +
        "CASE WHEN ok1 = 1 THEN round(sd2x * sd2x * 4 / sd1x, 4) + 0 END AS modified_csi " +
        "FROM v ORDER BY series_key"),
    "hrv_rmssd" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, ts, event_id FROM events), " +
        "d AS (SELECT user_id, c, c - lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dc FROM b) " +
        "SELECT user_id AS series_key, count(c) AS n, " +
        "CAST((2 * sum(c) + count(c)) // (2 * count(c)) AS DOUBLE) / 100.0 AS mean_nn, " +
        "round(CASE WHEN count(c) > 1 THEN sqrt(CAST(count(c) * sum(c * c) - sum(c) * sum(c) AS DOUBLE) / (count(c) * (count(c) - 1))) / 100.0 END, 2) AS sdnn, " +
        "round(CASE WHEN count(dc) > 0 THEN sqrt(CAST(sum(dc * dc) AS DOUBLE) / count(dc)) / 100.0 END, 2) AS rmssd, " +
        "CASE WHEN count(dc) > 0 THEN CAST((2 * 10000 * sum(CASE WHEN abs(dc) > 5000 THEN 1 ELSE 0 END) + count(dc)) // (2 * count(dc)) AS DOUBLE) / 10000.0 END AS pnn " +
        "FROM d GROUP BY user_id ORDER BY series_key"),
    "agg_argmax" ->
      ("WITH c AS (SELECT user_id, event_type, count(*) n FROM events GROUP BY 1, 2), " +
        "r AS (SELECT user_id, event_type, n, row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type DESC) rn FROM c) " +
        "SELECT user_id, event_type AS top_type, n AS n_top FROM r WHERE rn = 1 ORDER BY user_id"),
    // multimodal roundtrip invisibility: the engine synthesizes real
    // BMP/WAV bytes from the key lattice, decodes them through the real
    // container codecs, and hashes exact integer features; the oracle
    // recomputes the same integers from the lattice formula directly —
    // so the codec hop must be bit-lossless to match
    "mm_image_ahash" ->
      ("WITH px AS (SELECT p_partkey, k, ((p_partkey*37 + k*11) % 256) AS v " +
        "FROM part, generate_series(0, 63) AS g(k) WHERE p_partkey <= 200), " +
        "s AS (SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum, " +
        "CAST(min(v) AS BIGINT) AS px_min, CAST(max(v) AS BIGINT) AS px_max FROM px GROUP BY p_partkey), " +
        "h AS (SELECT px.p_partkey, " +
        "CAST(sum(CASE WHEN k < 32 AND 64*v > px_sum THEN (1::BIGINT << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS ahash_lo, " +
        "CAST(sum(CASE WHEN k >= 32 AND 64*v > px_sum THEN (1::BIGINT << CAST(k-32 AS INT)) ELSE 0 END) AS BIGINT) AS ahash_hi " +
        "FROM px JOIN s ON px.p_partkey = s.p_partkey GROUP BY px.p_partkey) " +
        "SELECT s.p_partkey, n_px, px_sum, px_min, px_max, ahash_lo, ahash_hi " +
        "FROM s JOIN h ON s.p_partkey = h.p_partkey ORDER BY s.p_partkey"),
    "mm_audio_energy" ->
      ("WITH smp AS (SELECT c_custkey, k, (((c_custkey*31 + k*17) % 4001) - 2000) AS s " +
        "FROM customer, generate_series(0, 255) AS g(k) WHERE c_custkey <= 200) " +
        "SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_samples, " +
        "CAST(sum(s*s) AS BIGINT) AS energy, CAST(max(abs(s)) AS BIGINT) AS peak_abs, " +
        "CAST(sum(abs(s)) AS BIGINT) AS sum_abs, " +
        "CAST(min(CASE WHEN k=0 THEN s END) AS BIGINT) AS s_first, " +
        "CAST(min(CASE WHEN k=255 THEN s END) AS BIGINT) AS s_last " +
        "FROM smp GROUP BY c_custkey ORDER BY c_custkey"),
    // PNG sibling of mm_image_ahash on an independent lattice — the
    // engine's bytes travel through zlib + the scanline filter chain
    "mm_image_png" ->
      ("WITH px AS (SELECT p_partkey, k, ((p_partkey*53 + k*29) % 256) AS v " +
        "FROM part, generate_series(0, 63) AS g(k) WHERE p_partkey <= 200), " +
        "s AS (SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum, " +
        "CAST(min(v) AS BIGINT) AS px_min, CAST(max(v) AS BIGINT) AS px_max FROM px GROUP BY p_partkey), " +
        "h AS (SELECT px.p_partkey, " +
        "CAST(sum(CASE WHEN k < 32 AND 64*v > px_sum THEN (1::BIGINT << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS ahash_lo, " +
        "CAST(sum(CASE WHEN k >= 32 AND 64*v > px_sum THEN (1::BIGINT << CAST(k-32 AS INT)) ELSE 0 END) AS BIGINT) AS ahash_hi " +
        "FROM px JOIN s ON px.p_partkey = s.p_partkey GROUP BY px.p_partkey) " +
        "SELECT s.p_partkey, n_px, px_sum, px_min, px_max, ahash_lo, ahash_hi " +
        "FROM s JOIN h ON s.p_partkey = h.p_partkey ORDER BY s.p_partkey"),
    // video pillar: 3 DIB frames; wsum weights pixels by 1-based frame
    // number so a frame-order slip in the container index fails the hash
    "mm_video_frames" ->
      ("WITH px AS (SELECT s_suppkey, k, ((s_suppkey*13 + k*7) % 256) AS v " +
        "FROM supplier, generate_series(0, 191) AS g(k) WHERE s_suppkey <= 200) " +
        "SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_px, " +
        "CAST(count(*) // 64 AS BIGINT) AS n_frames, " +
        "CAST(sum(v) AS BIGINT) AS px_sum, CAST(min(v) AS BIGINT) AS px_min, " +
        "CAST(max(v) AS BIGINT) AS px_max, " +
        "CAST(sum((k // 64 + 1) * v) AS BIGINT) AS wsum " +
        "FROM px GROUP BY s_suppkey ORDER BY s_suppkey"),
    // MP4 metadata invisibility: every ISO-BMFF header field the engine
    // parses out of real bytes is a closed-form function of the key
    "mm_video_mp4_meta" ->
      ("SELECT s_suppkey, 'isom' AS brand, CAST(1000 AS BIGINT) AS mv_timescale, " +
        "CAST(1 AS BIGINT) AS n_tracks, 'video' AS kind, " +
        "CASE CAST(s_suppkey % 4 AS INT) WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1' " +
        "WHEN 2 THEN 'vp09' ELSE 'av01' END AS codec, " +
        "CAST(16 + (s_suppkey % 16) * 8 AS BIGINT) AS width, " +
        "CAST(16 + (s_suppkey % 9) * 8 AS BIGINT) AS height, " +
        "CAST(1000 AS BIGINT) AS trk_timescale, " +
        "CAST(500 + s_suppkey * 37 AS BIGINT) AS dur_ms, " +
        "CAST(1 + (s_suppkey % 30) AS BIGINT) AS n_samples " +
        "FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey"),
    // MP4 sample-table walk invisibility: one row per coded sample;
    // rel_off replays the size prefix-sum the multi-chunk stsc/stco
    // resolution must reproduce, dur replays the RLE'd stts deltas.
    // generate_series is INCLUSIVE of its upper bound, so 0..sk%13
    // yields the encoder's 1 + sk%13 samples.
    "mm_video_mp4_samples" ->
      ("WITH k AS (SELECT s_suppkey AS sk FROM supplier WHERE s_suppkey <= 200), " +
        "g AS (SELECT i FROM generate_series(0, 12) t(i)), " +
        "s AS (SELECT sk, i, 20 + ((sk*19 + i*23) % 181) AS sz, " +
        "40 + ((sk + i) % 7) AS dur " +
        "FROM k CROSS JOIN g WHERE i <= sk % 13) " +
        "SELECT sk AS s_suppkey, " +
        "CASE CAST(sk % 4 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'avc1' " +
        "WHEN 2 THEN 'hvc1' ELSE 'av01' END AS codec, " +
        "CAST(i AS BIGINT) AS i, " +
        "CAST(COALESCE(sum(sz) OVER (PARTITION BY sk ORDER BY i " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rel_off, " +
        "CAST(sz AS BIGINT) AS sz, CAST(dur AS BIGINT) AS dur " +
        "FROM s ORDER BY s_suppkey, i"),
    // EXIF invisibility: every tag parsed out of the real APP1/TIFF
    // bytes is a closed-form key function; byte order alternates by
    // key parity so both endiannesses are judged
    "mm_image_exif" ->
      ("SELECT p_partkey, " +
        "CASE WHEN p_partkey % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order, " +
        "CAST(100 + p_partkey % 50 AS BIGINT) AS width, " +
        "CAST(80 + p_partkey % 37 AS BIGINT) AS height, " +
        "'CAM-' || CAST(p_partkey % 13 AS VARCHAR) AS make, " +
        "CAST(1 + p_partkey % 8 AS BIGINT) AS orientation, " +
        "'2024:' || lpad(CAST(1 + p_partkey % 12 AS VARCHAR), 2, '0') || ':' || " +
        "lpad(CAST(1 + p_partkey % 28 AS VARCHAR), 2, '0') || ' ' || " +
        "lpad(CAST(p_partkey % 24 AS VARCHAR), 2, '0') || ':' || " +
        "lpad(CAST(p_partkey % 60 AS VARCHAR), 2, '0') || ':' || " +
        "lpad(CAST(p_partkey % 60 AS VARCHAR), 2, '0') AS dt " +
        "FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"),
    // EXIF sub-IFD + GPS invisibility: the pointer-walked fields are
    // closed-form key functions; coordinates compare as exact integer
    // centi-arcseconds (float-free) folded from the 3xRATIONALs
    "mm_image_exif_gps" ->
      ("SELECT p_partkey, " +
        "CASE WHEN p_partkey % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order, " +
        "'2023:' || lpad(CAST(1 + p_partkey % 12 AS VARCHAR), 2, '0') || ':' || " +
        "lpad(CAST(1 + p_partkey % 28 AS VARCHAR), 2, '0') || ' ' || " +
        "lpad(CAST(p_partkey % 24 AS VARCHAR), 2, '0') || ':' || " +
        "lpad(CAST((p_partkey * 7) % 60 AS VARCHAR), 2, '0') || ':' || " +
        "lpad(CAST((p_partkey * 11) % 60 AS VARCHAR), 2, '0') AS dto, " +
        "CAST(100 * (1 + p_partkey % 32) AS BIGINT) AS iso, " +
        "CAST(1 + p_partkey % 3 AS BIGINT) AS expo_num, " +
        "CAST(125 * (1 + p_partkey % 16) AS BIGINT) AS expo_den, " +
        "CAST((CASE WHEN p_partkey % 3 = 0 THEN -1 ELSE 1 END) * " +
        "((p_partkey % 90) * 360000 + (p_partkey % 60) * 6000 + (p_partkey * 37) % 6000) AS BIGINT) AS lat_centisec, " +
        "CAST((CASE WHEN p_partkey % 5 = 0 THEN 1 ELSE -1 END) * " +
        "((p_partkey % 180) * 360000 + ((p_partkey * 13) % 60) * 6000 + (p_partkey * 53) % 6000) AS BIGINT) AS lon_centisec " +
        "FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"),
    // sniff-route invisibility: format, kind and the per-format feature
    // are closed-form key functions; a mis-sniffed payload routes to the
    // wrong decoder and throws or moves the feature (extension-based
    // routing fails every row — the extensions all lie)
    "mm_sniff_route" ->
      ("SELECT p_partkey AS k, " +
        "CASE p_partkey % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' WHEN 2 THEN 'wav' ELSE 'jpeg' END AS format, " +
        "CASE p_partkey % 4 WHEN 2 THEN 'audio' ELSE 'image' END AS kind, " +
        "CAST(CASE p_partkey % 4 " +
        "WHEN 0 THEN list_sum(list_transform(range(0, 64), j -> (p_partkey*37 + j*11) % 256)) " +
        "WHEN 1 THEN list_sum(list_transform(range(0, 64), j -> (p_partkey*53 + j*29) % 256)) " +
        "WHEN 2 THEN list_sum(list_transform(range(0, 256), j -> ((p_partkey*31 + j*17) % 4001 - 2000) * ((p_partkey*31 + j*17) % 4001 - 2000))) " +
        "ELSE (100 + p_partkey % 50) * 10 + 1 + p_partkey % 8 END AS BIGINT) AS feature " +
        "FROM part WHERE p_partkey <= 160 ORDER BY p_partkey"),
    // WebDataset invisibility: image lattice, caption and label are all
    // closed-form key functions; a tar header slip, padding error, or
    // wrong-key grouping moves px_sum/caption/label
    // pax invisibility: the full 107-char key must survive the x-header
    // path override (key_len pins it); px_sum/caption/label are
    // closed-form key lattices as in the ustar row
    "source_tar_pax" ->
      ("SELECT p_partkey AS k, " +
        "CAST(length('webdataset/shards/split-' || (p_partkey % 4) || '/category-' || (p_partkey % 7) || '/' || repeat('x', 60) || '-' || lpad(CAST(p_partkey AS VARCHAR), 9, '0')) AS BIGINT) AS key_len, " +
        "CAST(list_sum(list_transform(range(0, 64), j -> (p_partkey*61 + j*29) % 256)) AS BIGINT) AS px_sum, " +
        "'pax caption ' || p_partkey || ' omega ' || ((p_partkey * p_partkey) % 9973) AS caption, " +
        "CAST(p_partkey % 10 AS BIGINT) AS label " +
        "FROM part WHERE p_partkey <= 120 ORDER BY p_partkey"),
    "source_tar_webdataset" ->
      ("SELECT p_partkey AS k, " +
        "CAST(list_sum(list_transform(range(0, 64), j -> (p_partkey*41 + j*23) % 256)) AS BIGINT) AS px_sum, " +
        "'caption ' || p_partkey || ' alpha ' || ((p_partkey * p_partkey) % 9973) AS caption, " +
        "CAST(p_partkey % 10 AS BIGINT) AS label, " +
        "CAST(length('caption ' || p_partkey || ' alpha ' || ((p_partkey * p_partkey) % 9973)) AS BIGINT) AS n_caption_chars " +
        "FROM part WHERE p_partkey <= 120 ORDER BY p_partkey"),
    // zip-ingest invisibility: format and feature are closed-form key
    // functions; a central-directory offset slip, wrong CRC acceptance,
    // inflate error, or mis-sniffed entry moves the hash
    "mm_zip_ingest" ->
      ("SELECT p_partkey AS k, " +
        "CASE WHEN p_partkey % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format, " +
        "CAST(CASE WHEN p_partkey % 2 = 0 " +
        "THEN list_sum(list_transform(range(0, 64), j -> (p_partkey*59 + j*17) % 256)) " +
        "ELSE list_sum(list_transform(range(0, 256), j -> ((p_partkey*43 + j*19) % 4001 - 2000) * ((p_partkey*43 + j*19) % 4001 - 2000))) " +
        "END AS BIGINT) AS feature " +
        "FROM part WHERE p_partkey <= 140 ORDER BY p_partkey"),
    // decimal semantics: every decimal output is scale-pinned and
    // compared as a string (DuckDB's pandas bridge degrades decimals to
    // float64), so result SCALE is part of the judged contract
    // decimal division: Spark keeps DECIMAL (result scale max(6,s1+p2+1),
    // half-up), DuckDB promotes to DOUBLE — both pinned to a DECIMAL(20,6)
    // string; divisors are chosen so the 6-dp digit is far from any
    // rounding boundary (see Scalars.fnDecimalDiv). NULLIF replays
    // try_divide's null-not-error zero contract.
    "fn_decimal_div" ->
      ("WITH d AS (SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS dp " +
        "FROM part WHERE p_partkey <= 200) " +
        "SELECT p_partkey, CAST(dp AS VARCHAR) AS price_d, " +
        "CAST(CAST(dp / CAST(7 AS DECIMAL(1,0)) AS DECIMAL(20,6)) AS VARCHAR) AS div_7, " +
        "CAST(CAST(dp / CAST(1.5 AS DECIMAL(2,1)) AS DECIMAL(20,6)) AS VARCHAR) AS div_1_5, " +
        "CAST(CAST(dp / CAST(0.25 AS DECIMAL(3,2)) AS DECIMAL(20,6)) AS VARCHAR) AS div_quarter, " +
        "CAST(CAST(dp / NULLIF(0, 0) AS DECIMAL(20,6)) AS VARCHAR) AS div_zero " +
        "FROM d ORDER BY p_partkey"),
    "fn_decimal" ->
      ("WITH d AS (SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS dp " +
        "FROM part WHERE p_partkey <= 200) " +
        "SELECT p_partkey, CAST(dp AS VARCHAR) AS price_d, " +
        "CAST(CAST(dp + CAST(0.005 AS DECIMAL(3,3)) AS DECIMAL(14,3)) AS VARCHAR) AS plus_half_cent, " +
        "CAST(CAST(dp * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(15,3)) AS VARCHAR) AS taxed, " +
        "CAST(CAST(round(dp * CAST(1.1 AS DECIMAL(2,1)), 1) AS DECIMAL(14,1)) AS VARCHAR) AS taxed_r1, " +
        "CAST(floor(dp) AS BIGINT) AS price_floor, " +
        "CAST(ceil(dp) AS BIGINT) AS price_ceil " +
        "FROM d ORDER BY p_partkey"),
    "agg_decimal_money" ->
      ("WITH l AS (SELECT l_returnflag, l_linestatus, " +
        "CAST(l_extendedprice AS DECIMAL(12,2)) AS price, " +
        "CAST(l_discount AS DECIMAL(12,2)) AS disc FROM lineitem) " +
        "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(CAST(sum(price) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price, " +
        "CAST(CAST(sum(price * (CAST(1.00 AS DECIMAL(3,2)) - disc)) AS DECIMAL(20,4)) AS VARCHAR) AS sum_charge, " +
        "CAST(CAST(round(sum(price * (CAST(1.00 AS DECIMAL(3,2)) - disc)), 2) AS DECIMAL(20,2)) AS VARCHAR) AS sum_charge_r2, " +
        "CAST(sum(price) AS DOUBLE) / count(*) AS avg_price, " +
        "CAST(min(price) AS VARCHAR) AS min_price, " +
        "CAST(max(price) AS VARCHAR) AS max_price " +
        "FROM l GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    // grouping introspection: both engines pack GROUPING(a, b) bits
    // left-to-right MSB-first — judged, not assumed
    "agg_grouping_id" ->
      ("SELECT coalesce(l_returnflag, '(all)') AS rf, " +
        "coalesce(l_linestatus, '(all)') AS ls, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
        "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf, " +
        "CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY gid, rf, ls"),
    // SCD-2 invisibility: the engine applies three batches INCREMENTALLY
    // (close-and-append); the oracle reconstructs the same history
    // non-incrementally with a per-key lead() window
    "source_scd2" ->
      ("WITH batches AS (" +
        "SELECT o_orderkey, o_orderpriority, 1 AS v FROM orders " +
        "UNION ALL SELECT o_orderkey, '9-RECLASSIFIED', 2 FROM orders WHERE o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey, '0-ESCALATED', 3 FROM orders WHERE o_orderkey % 21 = 0), " +
        "h AS (SELECT o_orderkey, o_orderpriority, CAST(v AS BIGINT) AS effective_from, " +
        "CAST(lead(v) OVER (PARTITION BY o_orderkey ORDER BY v) AS BIGINT) AS effective_to FROM batches) " +
        "SELECT o_orderkey, o_orderpriority, effective_from, effective_to, " +
        "(effective_to IS NULL) AS is_current " +
        "FROM h WHERE o_orderkey <= 600 ORDER BY o_orderkey, effective_from"),
    // decimal running balance: exact window sum, scale-pinned string
    "win_decimal_cumsum" ->
      ("SELECT o_orderkey, o_orderpriority, " +
        "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER " +
        "(PARTITION BY o_orderpriority ORDER BY o_orderkey) AS DECIMAL(18,2)) AS VARCHAR) AS running_total " +
        "FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey"),
    // IANA-zone conversions against DuckDB's ICU timezone(); session tz
    // is UTC on both engines, so naive ts ⇄ instant mappings line up
    "fn_timezone" ->
      ("SELECT event_id, ts, " +
        "CAST(timezone('America/New_York', ts::TIMESTAMPTZ) AS TIMESTAMP) AS ny_wall, " +
        "CAST(timezone('Asia/Tokyo', ts::TIMESTAMPTZ) AS TIMESTAMP) AS tokyo_wall, " +
        "CAST(timezone('Asia/Kathmandu', ts::TIMESTAMPTZ) AS TIMESTAMP) AS ktm_wall, " +
        "CAST(timezone('America/New_York', ts) AS TIMESTAMP) AS ny_as_utc, " +
        "CAST(extract(hour FROM timezone('America/New_York', ts::TIMESTAMPTZ)) AS BIGINT) AS ny_hour " +
        "FROM events WHERE event_id <= 200 ORDER BY event_id"),
    // URL canonicalization invisibility: the oracle rebuilds the
    // canonical form from the SOURCE columns — every normalization step
    // (case, port, fragment, utm strip, param sort) must fire in the
    // engine for the strings to match; 'b=' < 'id=' pins the sort order
    "text_url_canonical" ->
      ("SELECT p_partkey, " +
        "'https://w' || CAST(p_partkey % 7 AS VARCHAR) || '.example.com/cat/' || " +
        "lower(replace(p_type, ' ', '-')) || '/item?b=' || " +
        "replace(p_brand, '#', '-') || '&id=' || CAST(p_partkey AS VARCHAR) AS canon " +
        "FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"),
    // SCD-2 time travel: the v2 state recomputed directly (v2 rule
    // inlined, v3 not yet applied) must equal the engine's history
    // reconstruction — a wrong effective range moves count or key sum
    "source_scd2_asof" -> scd2AsofV2Sql,
    // the same v2 state served from the effective_to-PARTITIONED dim
    // layout (planning-time partition pruning) — layout invisibility,
    // like scan_partition_pruned / join_bucketed
    "source_scd2_pruned" -> scd2AsofV2Sql,
    // windowed SampEn: identical arithmetic to hrv_sampen, tumbling
    // 32-beat boxes, complete boxes only, templates never straddle edges
    "hrv_rolling_sampen" ->
      ("WITH base AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, " +
        "lead(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cn, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i FROM events), " +
        "boxed AS (SELECT user_id, i // 32 AS box, i - (i // 32) * 32 AS j, c, cn " +
        "FROM base WHERE cn IS NOT NULL AND i - (i // 32) * 32 <= 30), " +
        "fullbox AS (SELECT user_id, box FROM boxed GROUP BY user_id, box HAVING count(*) = 31), " +
        "t AS (SELECT boxed.* FROM boxed JOIN fullbox USING (user_id, box)), " +
        "p AS (SELECT a.user_id, a.box, " +
        "CAST(sum(CASE WHEN abs(a.c - b.c) <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs, " +
        "CAST(sum(CASE WHEN abs(a.c - b.c) <= 2000 AND abs(a.cn - b.cn) <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs " +
        "FROM t a JOIN t b ON a.user_id = b.user_id AND a.box = b.box AND a.j < b.j " +
        "GROUP BY a.user_id, a.box) " +
        "SELECT user_id, CAST(box AS BIGINT) AS box, b_pairs, a_pairs, " +
        "CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN round(-ln(CAST(a_pairs AS DOUBLE) / b_pairs), 6) + 0 END AS sampen " +
        "FROM p ORDER BY user_id, box"),
    // one-pass rule validation reshaped to (rule, violations, total);
    // the range and domain rules FIRE on this data so the hash proves
    // counting, not just zero-equality
    "source_quality_profile" ->
      ("WITH w AS (SELECT CAST(count(*) AS BIGINT) AS total, " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r1, " +
        "CAST(sum(CASE WHEN o_totalprice BETWEEN 1000.0 AND 300000.0 THEN 0 ELSE 1 END) AS BIGINT) AS r2, " +
        "CAST(sum(CASE WHEN o_orderstatus IN ('F','O') THEN 0 ELSE 1 END) AS BIGINT) AS r3, " +
        "CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 0 ELSE 1 END) AS BIGINT) AS r4 " +
        "FROM orders) SELECT * FROM (" +
        "SELECT 'not_null(o_custkey)' AS rule, r1 AS violations, total FROM w " +
        "UNION ALL SELECT 'in_range(o_totalprice,1000.0,300000.0)', r2, total FROM w " +
        "UNION ALL SELECT 'is_in(o_orderstatus)', r3, total FROM w " +
        "UNION ALL SELECT 'matches(o_orderpriority)', r4, total FROM w) ORDER BY rule"),
    // upsert invisibility: merged(base, delta) must equal the direct
    // recompute with the correction inlined
    "source_upsert" ->
      ("SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
        "round(sum(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END),2) AS total " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // DDSketch exact regime: integer values 1..49 occupy distinct
    // γ-buckets and round(representative) recovers them exactly;
    // probe fractions are exact-binary so ⌈q·n⌉ agrees across engines
    "agg_quantile_sketch" ->
      ("WITH v AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v FROM lineitem WHERE l_quantity <= 49), " +
        "r AS (SELECT l_returnflag, v, row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn, " +
        "count(*) OVER (PARTITION BY l_returnflag) AS n FROM v) " +
        "SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n, " +
        "CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.25*n) AS BIGINT)) THEN v END) AS BIGINT) AS q25, " +
        "CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.5*n) AS BIGINT)) THEN v END) AS BIGINT) AS q50, " +
        "CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.75*n) AS BIGINT)) THEN v END) AS BIGINT) AS q75, " +
        "(max(v) <= 49 AND min(v) >= 1) AS exact_regime " +
        "FROM r GROUP BY l_returnflag ORDER BY l_returnflag"),
    "agg_pivot_dynamic" ->
      ("SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, " +
        "round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END),2) AS F, " +
        "round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END),2) AS O, " +
        "round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END),2) AS P " +
        "FROM orders GROUP BY yr ORDER BY yr"),
    "agg_pivot" ->
      ("SELECT o_orderpriority, CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F, " +
        "CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O, " +
        "CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // rounding happens on the wide aggregate BEFORE the melt, both sides
    "agg_unpivot" ->
      "SELECT l_returnflag, metric, val FROM (SELECT l_returnflag, round(sum(l_quantity),2) AS qty, round(sum(l_extendedprice),2) AS price FROM lineitem GROUP BY 1) UNPIVOT (val FOR metric IN (qty, price)) ORDER BY l_returnflag, metric",
    "llm_train_split" ->
      ("SELECT lang, split, count(*) AS n, round(avg(n_chars), 2) AS avg_chars " +
        "FROM (SELECT lang, n_chars, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split " +
        "FROM (SELECT lang, n_chars, ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS b FROM documents)) " +
        "GROUP BY lang, split ORDER BY lang, split"),
    // the exact regexp chain of graft.functions.Redact, replayed in RE2:
    // email -> SSN -> card -> phone -> IPv4 (order is part of the contract)
    // fold-counting, same as Redact.piiCount: pattern k is counted on the
    // text already scrubbed by patterns 1..k-1, so overlapping shapes are
    // never double-counted (exact replacement count, not an upper bound)
    "text_pii_redact" ->
      ("WITH raw AS (SELECT doc_id, text || ' contact agent' || doc_id || '@example.com or 555-867-530' || (doc_id % 10) || ' ssn 123-45-678' || (doc_id % 10) || ' ip 10.0.0.' || (doc_id % 256) AS t0 FROM documents WHERE doc_id < 200), " +
        "s1 AS (SELECT doc_id, regexp_replace(t0,'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}','[EMAIL]','g') AS t1, len(regexp_extract_all(t0,'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS c1 FROM raw), " +
        "s2 AS (SELECT doc_id, regexp_replace(t1,'\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b','[SSN]','g') AS t2, c1, len(regexp_extract_all(t1,'\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS c2 FROM s1), " +
        "s3 AS (SELECT doc_id, regexp_replace(t2,'\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b','[CARD]','g') AS t3, c1, c2, len(regexp_extract_all(t2,'\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b')) AS c3 FROM s2), " +
        "s4 AS (SELECT doc_id, regexp_replace(t3,'\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b','[PHONE]','g') AS t4, c1, c2, c3, len(regexp_extract_all(t3,'\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS c4 FROM s3) " +
        "SELECT doc_id, regexp_replace(t4,'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b','[IP]','g') AS redacted, " +
        "CAST(c1 + c2 + c3 + c4 + len(regexp_extract_all(t4,'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS pii_hits " +
        "FROM s4 ORDER BY doc_id"),
    // list-intersect containment (exact) over the same bounded window the
    // Spark side shingle-joins; filter on the ROUNDED value both sides
    "text_decontaminate" ->
      ("WITH c AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(text) - 2, 1) + 1), i -> substr(text, i::INT, 3))) AS sh FROM documents WHERE doc_id < 200 AND doc_id % 10 <> 0), " +
        "b AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(text) - 2, 1) + 1), i -> substr(text, i::INT, 3))) AS sh FROM documents WHERE doc_id < 200 AND doc_id % 10 = 0) " +
        "SELECT c.doc_id, round(max(CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) / len(c.sh)), 6) AS cont " +
        "FROM c CROSS JOIN b GROUP BY c.doc_id " +
        "HAVING round(max(CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) / len(c.sh)), 6) >= 0.8 ORDER BY c.doc_id"),
    // LATERAL text is identical on both engines (comma-join spelling for
    // DuckDB, which wants an ON clause with JOIN LATERAL)
    // probe predicate stated inside the subquery too (≡ via the
    // correlation equality): neither optimizer infers a range
    // constraint through the decorrelated window, and without it both
    // engines rank the whole fact table for a 300-order probe
    "join_lateral" ->
      ("SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice " +
        "FROM orders o, LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem " +
        "WHERE l_orderkey = o.o_orderkey AND l_orderkey < 300 ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t " +
        "WHERE o.o_orderkey < 300 ORDER BY o.o_orderkey, t.l_extendedprice DESC, t.l_linenumber"),
    // explicit power-sum moment algebra, pinned to the same association
    // order as the Spark side (the engines' skewness/kurtosis BUILT-INS
    // disagree on definition, so neither is used)
    "agg_moments" ->
      ("WITH p AS (SELECT l_returnflag, count(*) AS n, avg(l_quantity) AS m1, " +
        "avg(l_quantity*l_quantity) AS m2, avg(l_quantity*l_quantity*l_quantity) AS m3, " +
        "avg(l_quantity*l_quantity*l_quantity*l_quantity) AS m4 FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, round(m1, 4) AS mean_q, " +
        "round((m3 - 3.0*m1*m2 + 2.0*m1*m1*m1) / power(m2 - m1*m1, 1.5), 6) + 0 AS skew_pop, " +
        "round((m4 - 4.0*m1*m3 + 6.0*m1*m1*m2 - 3.0*m1*m1*m1*m1) / ((m2 - m1*m1)*(m2 - m1*m1)) - 3.0, 6) + 0 AS kurt_pop " +
        "FROM p ORDER BY l_returnflag"),
    // md5 prefix < '1a' ≈ 26/256 of rows, reproducible on any engine
    "sample_stratified" ->
      ("WITH s AS (SELECT l_returnflag, count(*) AS n_sample, round(avg(l_quantity), 4) AS avg_sample " +
        "FROM lineitem WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a' GROUP BY l_returnflag), " +
        "f AS (SELECT l_returnflag, count(*) AS n_full, round(avg(l_quantity), 4) AS avg_full FROM lineitem GROUP BY l_returnflag) " +
        "SELECT s.l_returnflag, n_sample, avg_sample, n_full, avg_full " +
        "FROM s JOIN f USING (l_returnflag) ORDER BY l_returnflag"),
    // 5 power-iteration rounds unrolled as chained CTEs — the identical
    // fixed-round arithmetic the Spark loop runs (teleport (1.0-0.85)/n,
    // damped contribution sum rank/degree over symmetrized edges)
    "graph_pagerank" ->
      ("WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src, 's' || CAST(l_suppkey AS VARCHAR) AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), " +
        "deg AS (SELECT src, count(*) AS degree FROM e GROUP BY src), " +
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), " +
        "r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM deg), " +
        "r1 AS (SELECT e.dst AS node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / deg.degree) AS rank FROM e JOIN deg USING (src) JOIN r0 r ON r.node = e.src GROUP BY e.dst), " +
        "r2 AS (SELECT e.dst AS node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / deg.degree) AS rank FROM e JOIN deg USING (src) JOIN r1 r ON r.node = e.src GROUP BY e.dst), " +
        "r3 AS (SELECT e.dst AS node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / deg.degree) AS rank FROM e JOIN deg USING (src) JOIN r2 r ON r.node = e.src GROUP BY e.dst), " +
        "r4 AS (SELECT e.dst AS node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / deg.degree) AS rank FROM e JOIN deg USING (src) JOIN r3 r ON r.node = e.src GROUP BY e.dst), " +
        "r5 AS (SELECT e.dst AS node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / deg.degree) AS rank FROM e JOIN deg USING (src) JOIN r4 r ON r.node = e.src GROUP BY e.dst) " +
        "SELECT deg.src AS node, deg.degree, round(r5.rank, 8) AS rank FROM deg JOIN r5 ON r5.node = deg.src ORDER BY node"),
    // daily SUM signal (cent-multiples never sit on a 2-dp half
    // boundary) and α = 1/3 (3-adic weights cannot produce an exact
    // half-cent, by parity) — see tsEwma's float-determinism note; α is
    // the same double expression (1.0/3, 2.0/3) as the Spark side
    "ts_ewma" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS x FROM events GROUP BY user_id, CAST(ts AS DATE)), " +
        "seq AS (SELECT user_id, day, x, CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS DOUBLE) AS i FROM daily), " +
        "u AS (SELECT user_id, day, x, i, CASE WHEN i = 0 THEN x ELSE x * (1.0::DOUBLE/3) * power(2.0::DOUBLE/3, -i) END AS u FROM seq) " +
        "SELECT user_id, CAST(day AS TIMESTAMP) AS day, round(x, 2) AS x_daily, " +
        "round(power(2.0::DOUBLE/3, i) * sum(u) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS ewma " +
        "FROM u ORDER BY user_id, day"),
    // the >2 cutoff is a float comparison on both sides; nearest |z| to
    // the boundary is ~1e-3 at every SF (checked), far beyond summation
    // noise, so the judged row set is stable
    // PAA (full 10-sample segments, exact cent sums) + quartile-adaptive
    // SAX: quartiles of integers interpolate at quarter positions (x4 ->
    // exact integers), symbols are three integer compares
    "ts_sax" ->
      ("WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn FROM events), " +
        "g AS (SELECT user_id, rn // 10 AS seg, CAST(sum(c) AS BIGINT) AS paa, count(*) AS cnt FROM b GROUP BY 1, 2), " +
        "q AS (SELECT user_id, seg, paa, " +
        "CAST(4 * quantile_cont(paa, 0.25) OVER (PARTITION BY user_id) AS BIGINT) AS q1, " +
        "CAST(4 * quantile_cont(paa, 0.5) OVER (PARTITION BY user_id) AS BIGINT) AS q2, " +
        "CAST(4 * quantile_cont(paa, 0.75) OVER (PARTITION BY user_id) AS BIGINT) AS q3 " +
        "FROM g WHERE cnt = 10) " +
        "SELECT user_id AS series_key, seg, paa, " +
        "CASE WHEN 4 * paa < q1 THEN 'a' WHEN 4 * paa < q2 THEN 'b' WHEN 4 * paa < q3 THEN 'c' ELSE 'd' END AS sym " +
        "FROM q ORDER BY series_key, seg"),
    // day-of-week seasonal index: portable epoch-day dow arithmetic
    // ((days+4) mod 7, 0=Sunday), index = rational of exact int64 sums
    // half-up-rounded to basis points in integer space
    "ts_dow_profile" ->
      ("WITH d AS (SELECT user_id, CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dayn, " +
        "CAST(round(value * 100) AS BIGINT) AS c FROM events), " +
        "daily AS (SELECT user_id, dayn, sum(c) AS day_sum FROM d GROUP BY 1, 2), " +
        "byd AS (SELECT user_id, (dayn + 4) % 7 AS dow, sum(day_sum) AS dow_sum_cents, CAST(count(*) AS BIGINT) AS dow_days FROM daily GROUP BY 1, 2), " +
        "t AS (SELECT *, sum(dow_sum_cents) OVER (PARTITION BY user_id) AS all_sum, " +
        "sum(dow_days) OVER (PARTITION BY user_id) AS all_days FROM byd) " +
        "SELECT user_id, dow, dow_days, CAST(dow_sum_cents AS BIGINT) AS dow_sum_cents, " +
        "CAST((2 * 10000 * dow_sum_cents * all_days + dow_days * all_sum) // (2 * dow_days * all_sum) AS BIGINT) AS idx_bp " +
        "FROM t WHERE all_sum > 0 ORDER BY user_id, dow"),
    // one-pass multi-grain rollup: GROUPING SETS over day/week/month
    // buckets (both engines truncate weeks to Monday); exact integers
    "ts_multires" ->
      ("WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
        "CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk, " +
        "CAST(date_trunc('month', ts) AS TIMESTAMP) AS mo, " +
        "CAST(round(value * 100) AS BIGINT) AS c FROM events WHERE user_id < 5) " +
        "SELECT user_id, CASE WHEN day IS NOT NULL THEN 'day' WHEN wk IS NOT NULL THEN 'week' ELSE 'month' END AS grain, " +
        "coalesce(day, wk, mo) AS bucket, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sum_cents " +
        "FROM d GROUP BY GROUPING SETS ((user_id, day), (user_id, wk), (user_id, mo)) " +
        "ORDER BY user_id, grain, bucket"),
    // robust median/MAD gate, exact on the doubled-integer lattice:
    // m2 = 2·median(c) and mad4 = 2·median(|2c−m2|) are integers, the
    // 3.5×MAD threshold cross-multiplies to 4·dev2 > 7·mad4, and the
    // score 2·dev2/mad4 is a RATIONAL -> integer half-up at 4 dp
    "ts_mad_anomaly" ->
      ("WITH b AS (SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS c FROM events), " +
        "m AS (SELECT user_id, event_id, c, CAST(2 * quantile_cont(c, 0.5) OVER (PARTITION BY user_id) AS BIGINT) AS m2 FROM b), " +
        "d AS (SELECT user_id, event_id, c, abs(2 * c - m2) AS dev2 FROM m), " +
        "md AS (SELECT user_id, event_id, c, dev2, CAST(2 * quantile_cont(dev2, 0.5) OVER (PARTITION BY user_id) AS BIGINT) AS mad4 FROM d) " +
        "SELECT user_id AS series_key, event_id, CAST(c AS DOUBLE) / 100.0 AS value, " +
        "CAST((2 * (dev2 * 20000) + mad4) // (2 * mad4) AS DOUBLE) / 10000.0 AS score " +
        "FROM md WHERE mad4 > 0 AND dev2 * 4 > mad4 * 7 ORDER BY series_key, event_id"),
    // windowed DISTINCT count: DuckDB states it natively; Spark's
    // window functions refuse DISTINCT, so the engine composes
    // size(array_distinct(collect_list over frame)) -- exact integers
    "win_distinct_frame" ->
      ("SELECT event_id, user_id, CAST(count(*) OVER win AS BIGINT) AS n_frame, " +
        "CAST(count(DISTINCT event_type) OVER win AS BIGINT) AS n_distinct " +
        "FROM events WHERE user_id < 40 " +
        "WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    // GROUPS frame mode, which NEITHER engine has natively: the engine
    // composes agg-per-day + ROWS window + attach join; the oracle
    // states the same frame as dense_rank + RANGE +-1 on the rank --
    // two independent compositions, exact integer cents
    "win_frame_groups" ->
      ("WITH b AS (SELECT event_id, user_id, CAST(ts AS DATE) AS day, CAST(round(value * 100) AS BIGINT) AS c FROM events), " +
        "r AS (SELECT *, dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS rk FROM b) " +
        "SELECT event_id, user_id, CAST(day AS TIMESTAMP) AS day, " +
        "CAST(sum(c) OVER (PARTITION BY user_id ORDER BY rk RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS grp_sum_cents " +
        "FROM r ORDER BY event_id"),
    // the oracle uses DuckDB's NATIVE `EXCLUDE CURRENT ROW` — proving
    // the engine's composed form (full-frame aggregate minus the current
    // row) exactly equals the SQL:2011 frame-exclusion semantics
    "win_frame_exclude" ->
      ("WITH b AS (SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS c FROM events WHERE user_id < 40), " +
        "w AS (SELECT user_id, event_id, sum(c) OVER win AS sum_c, count(c) OVER win AS n_excl FROM b " +
        "WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING EXCLUDE CURRENT ROW)) " +
        "SELECT user_id AS series_key, event_id, n_excl, " +
        "CASE WHEN n_excl > 0 THEN CAST(sum_c AS DOUBLE) / 100.0 END AS sum_excl, " +
        "CASE WHEN n_excl > 0 THEN CAST((2 * (sum_c * 100) + n_excl) // (2 * n_excl) AS DOUBLE) / 10000.0 END AS loo_mean " +
        "FROM w ORDER BY series_key, event_id"),
    "ts_anomaly_zscore" ->
      ("WITH t AS (SELECT event_id, user_id, ts, value, " +
        "avg(value) OVER w AS mu, stddev_samp(value) OVER w AS sd, count(value) OVER w AS nw " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_id, user_id, ts, round(value, 2) AS value, round((value - mu) / sd, 2) AS z " +
        "FROM t WHERE nw >= 10 AND sd > 0.000000001 AND abs((value - mu) / sd) > 2 ORDER BY event_id"),
    // exact end to end: integer-cent quantization, integer tolerance
    // compares, exact pair counts; only the final -ln(A/B) is float
    // DFA1: integer-cent profile, per-box exact moments (box-start
    // shift and skipped mean subtraction are both absorbed exactly by
    // the linear fit), one identical float tree for RSS, pinned
    // 2·ln2 literal so both engines divide by the identical double
    "hrv_dfa" ->
      ("WITH s AS (SELECT user_id, row_number() OVER w AS i, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS y, " +
        "count(*) OVER (PARTITION BY user_id) AS nn FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "e AS (SELECT user_id, i, y, n FROM s CROSS JOIN (VALUES (4), (8), (16)) sc(n) " +
        "WHERE nn >= 64 AND i <= nn - (nn % n)), " +
        "b0 AS (SELECT user_id, n, (i - 1) // n AS b, (i - 1) % n + 1 AS t, " +
        "y - first_value(y) OVER (PARTITION BY user_id, n, (i - 1) // n ORDER BY i) AS z FROM e), " +
        "bx AS (SELECT user_id, n, b, CAST(sum(z) AS BIGINT) AS sy, " +
        "CAST(sum(z * z) AS BIGINT) AS syy, CAST(sum(t * z) AS BIGINT) AS sty FROM b0 GROUP BY 1, 2, 3), " +
        "r AS (SELECT user_id, n, " +
        "(CAST(n * syy - sy * sy AS DOUBLE) - (CAST(n * sty - (n * (n + 1) // 2) * sy AS DOUBLE) * CAST(n * sty - (n * (n + 1) // 2) * sy AS DOUBLE)) / CAST(n * n * (n * n - 1) // 12 AS DOUBLE)) / CAST(n AS DOUBLE) AS rss FROM bx), " +
        "f AS (SELECT user_id, n, sqrt(sum(rss) / count(*)) AS fn FROM r GROUP BY 1, 2), " +
        "p AS (SELECT user_id, max(CASE WHEN n = 4 THEN fn END) AS f4r, " +
        "max(CASE WHEN n = 8 THEN fn END) AS f8r, max(CASE WHEN n = 16 THEN fn END) AS f16r FROM f GROUP BY 1) " +
        "SELECT user_id, round(f4r, 6) AS f4, round(f8r, 6) AS f8, round(f16r, 6) AS f16, " +
        "round(ln(f16r / f4r) / 1.3862943611198906, 6) AS alpha1 FROM p ORDER BY user_id"),
    // multiscale entropy: coarse grains kept as exact tau-window cent
    // SUMS with the tolerance scaled by tau (the ts_sax PAA lattice);
    // A/B are exact integer counts at every scale; + 0 normalizes the
    // -0.0 DuckDB emits when A == B (-ln(1) -- hit at sf1, tau=4)
    "hrv_mse" ->
      ("SELECT * FROM (SELECT user_id, CAST(1 AS BIGINT) AS tau, b_pairs, a_pairs, CASE WHEN a_pairs > 0 AND" +
        " b_pairs > 0 THEN round(-ln(CAST(a_pairs AS DOUBLE) / b_pairs), 6) + 0 END AS sampen FROM (SELECT a." +
        "user_id, CAST(sum(CASE WHEN abs(a.y - b.y) <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs, CAST(su" +
        "m(CASE WHEN abs(a.y - b.y) <= 2000 AND abs(a.yn - b.yn) <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS a_p" +
        "airs FROM (SELECT user_id, y, lead(y) OVER (PARTITION BY user_id ORDER BY seg) AS yn, row_number() O" +
        "VER (PARTITION BY user_id ORDER BY seg) AS j FROM (SELECT user_id, (i // 1) AS seg, CAST(sum(c) AS B" +
        "IGINT) AS y FROM (SELECT user_id, CAST(round(value*100) AS BIGINT) AS c, row_number() OVER (PARTITIO" +
        "N BY user_id ORDER BY ts, event_id) - 1 AS i FROM events) GROUP BY 1, 2 HAVING count(*) = 1)) a JOIN" +
        " (SELECT user_id, y, lead(y) OVER (PARTITION BY user_id ORDER BY seg) AS yn, row_number() OVER (PART" +
        "ITION BY user_id ORDER BY seg) AS j FROM (SELECT user_id, (i // 1) AS seg, CAST(sum(c) AS BIGINT) AS" +
        " y FROM (SELECT user_id, CAST(round(value*100) AS BIGINT) AS c, row_number() OVER (PARTITION BY user" +
        "_id ORDER BY ts, event_id) - 1 AS i FROM events) GROUP BY 1, 2 HAVING count(*) = 1)) b ON a.user_id " +
        "= b.user_id AND a.j < b.j WHERE a.yn IS NOT NULL AND b.yn IS NOT NULL GROUP BY a.user_id) z UNION AL" +
        "L SELECT user_id, CAST(2 AS BIGINT) AS tau, b_pairs, a_pairs, CASE WHEN a_pairs > 0 AND b_pairs > 0 " +
        "THEN round(-ln(CAST(a_pairs AS DOUBLE) / b_pairs), 6) + 0 END AS sampen FROM (SELECT a.user_id, CAST" +
        "(sum(CASE WHEN abs(a.y - b.y) <= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs, CAST(sum(CASE WHEN a" +
        "bs(a.y - b.y) <= 4000 AND abs(a.yn - b.yn) <= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs FROM (SE" +
        "LECT user_id, y, lead(y) OVER (PARTITION BY user_id ORDER BY seg) AS yn, row_number() OVER (PARTITIO" +
        "N BY user_id ORDER BY seg) AS j FROM (SELECT user_id, (i // 2) AS seg, CAST(sum(c) AS BIGINT) AS y F" +
        "ROM (SELECT user_id, CAST(round(value*100) AS BIGINT) AS c, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id) - 1 AS i FROM events) GROUP BY 1, 2 HAVING count(*) = 2)) a JOIN (SELECT user" +
        "_id, y, lead(y) OVER (PARTITION BY user_id ORDER BY seg) AS yn, row_number() OVER (PARTITION BY user" +
        "_id ORDER BY seg) AS j FROM (SELECT user_id, (i // 2) AS seg, CAST(sum(c) AS BIGINT) AS y FROM (SELE" +
        "CT user_id, CAST(round(value*100) AS BIGINT) AS c, row_number() OVER (PARTITION BY user_id ORDER BY " +
        "ts, event_id) - 1 AS i FROM events) GROUP BY 1, 2 HAVING count(*) = 2)) b ON a.user_id = b.user_id A" +
        "ND a.j < b.j WHERE a.yn IS NOT NULL AND b.yn IS NOT NULL GROUP BY a.user_id) z UNION ALL SELECT user" +
        "_id, CAST(4 AS BIGINT) AS tau, b_pairs, a_pairs, CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN round(-l" +
        "n(CAST(a_pairs AS DOUBLE) / b_pairs), 6) + 0 END AS sampen FROM (SELECT a.user_id, CAST(sum(CASE WHE" +
        "N abs(a.y - b.y) <= 8000 THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs, CAST(sum(CASE WHEN abs(a.y - b.y)" +
        " <= 8000 AND abs(a.yn - b.yn) <= 8000 THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs FROM (SELECT user_id," +
        " y, lead(y) OVER (PARTITION BY user_id ORDER BY seg) AS yn, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY seg) AS j FROM (SELECT user_id, (i // 4) AS seg, CAST(sum(c) AS BIGINT) AS y FROM (SELECT u" +
        "ser_id, CAST(round(value*100) AS BIGINT) AS c, row_number() OVER (PARTITION BY user_id ORDER BY ts, " +
        "event_id) - 1 AS i FROM events) GROUP BY 1, 2 HAVING count(*) = 4)) a JOIN (SELECT user_id, y, lead(" +
        "y) OVER (PARTITION BY user_id ORDER BY seg) AS yn, row_number() OVER (PARTITION BY user_id ORDER BY " +
        "seg) AS j FROM (SELECT user_id, (i // 4) AS seg, CAST(sum(c) AS BIGINT) AS y FROM (SELECT user_id, C" +
        "AST(round(value*100) AS BIGINT) AS c, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)" +
        " - 1 AS i FROM events) GROUP BY 1, 2 HAVING count(*) = 4)) b ON a.user_id = b.user_id AND a.j < b.j " +
        "WHERE a.yn IS NOT NULL AND b.yn IS NOT NULL GROUP BY a.user_id) z) ORDER BY user_id, tau"),
    "hrv_sampen" ->
      ("WITH base AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c, " +
        "lead(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cn, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i FROM events), " +
        "t AS (SELECT user_id, c, cn, i FROM base WHERE cn IS NOT NULL), " +
        "p AS (SELECT a.user_id, " +
        "CAST(sum(CASE WHEN abs(a.c - b.c) <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs, " +
        "CAST(sum(CASE WHEN abs(a.c - b.c) <= 2000 AND abs(a.cn - b.cn) <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs " +
        "FROM t a JOIN t b ON a.user_id = b.user_id AND a.i < b.i GROUP BY a.user_id) " +
        "SELECT user_id, b_pairs, a_pairs, " +
        "CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN round(-ln(CAST(a_pairs AS DOUBLE) / b_pairs), 6) + 0 END AS sampen " +
        "FROM p ORDER BY user_id"),
    // per-series elapsed-seconds time base (see hrvBandPower); 1.0 is
    // cast to DOUBLE so the frequency constant folds in double, not
    // DECIMAL, exactly like the Spark side's 1.0/86400
    "hrv_band_power" ->
      ("WITH t AS (SELECT user_id, CAST(epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id) AS DOUBLE)/1000000.0 AS t, " +
        "value - avg(value) OVER (PARTITION BY user_id) AS c FROM events), " +
        "p AS (SELECT user_id, " +
        "(power(sum(c*cos(t*(2*pi()*(1.0::DOUBLE/86400)))), 2) + power(sum(c*sin(t*(2*pi()*(1.0::DOUBLE/86400)))), 2))/count(c) AS p0, " +
        "(power(sum(c*cos(t*(2*pi()*(1.0::DOUBLE/3600)))), 2) + power(sum(c*sin(t*(2*pi()*(1.0::DOUBLE/3600)))), 2))/count(c) AS p1 " +
        "FROM t GROUP BY user_id) " +
        "SELECT user_id AS series_key, round(p0, 2) AS p_daily, round(p1, 2) AS p_hourly, round(p0/p1, 4) AS band_ratio " +
        "FROM p ORDER BY series_key"),
    // pinned banded MinHash (4 bands × 4 rows): one md5 per shingle →
    // 32-bit int (the llm_train_split recipe), then fixed (a·h+b) mod
    // 2³¹−1 universal hashes — all-integer, so the oracle replays the
    // IDENTICAL banding, candidate set, and exact Jaccard
    "dedup_minhash_lsh" ->
      (s"WITH $minhashPairCtes " +
        "SELECT a_id, b_id, jac FROM j WHERE jac >= 0.8 ORDER BY a_id, b_id"),
    // the cap-ON configuration every 100 TB run actually ships (the
    // quadratic-blowup guard): buckets over 10 members are dropped
    // before the self-join — deterministic, so the oracle replays the
    // cap exactly via a per-bucket window count (same pinned hashes).
    "dedup_lsh_capped" ->
      (s"WITH ${minhashCtes(Some(10))} " +
        "SELECT a_id, b_id, jac FROM j WHERE jac >= 0.8 ORDER BY a_id, b_id"),
    // incremental-append invisibility for NEAR-dup: the engine bands
    // only the delta against a persisted signature store; the oracle is
    // the one-shot full recompute (dedup_minhash_lsh's SQL) the
    // incremental path must be byte-identical to
    "llm_lsh_append" ->
      (s"WITH $minhashPairCtes " +
        "SELECT a_id, b_id, jac FROM j WHERE jac >= 0.8 ORDER BY a_id, b_id"),
    // the pair set above rolled into CLUSTERS: recursive transitive
    // closure over the (tiny) dup-pair graph, component label = min
    // reachable id — the oracle twin of the engine's large-star/
    // small-star contraction
    "llm_dedup_clusters" ->
      (s"WITH RECURSIVE $minhashPairCtes, " +
        "dup AS (SELECT a_id, b_id FROM j WHERE jac >= 0.8), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM dup UNION ALL SELECT b_id, a_id FROM dup), " +
        "reach AS (SELECT u, v FROM edges UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u) " +
        "SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach " +
        "GROUP BY u ORDER BY doc_id"),
    // exact integer counts; the Jaccard is ONE integer/integer double
    // division — bit-identical on both engines, no float-tie risk
    "graph_common_neighbors" ->
      ("WITH e AS (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_custkey < 300), " +
        "deg AS (SELECT supp, count(*) AS deg FROM e GROUP BY supp), " +
        "p AS (SELECT a.supp AS s1, b.supp AS s2, count(*) AS common " +
        "FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp GROUP BY a.supp, b.supp) " +
        "SELECT s1, s2, common, d1.deg AS d1, d2.deg AS d2, " +
        "round(common / (d1.deg + d2.deg - common), 6) AS jaccard " +
        "FROM p JOIN deg d1 ON d1.supp = s1 JOIN deg d2 ON d2.supp = s2 " +
        "WHERE common >= 3 ORDER BY jaccard DESC, s1, s2 LIMIT 50"),
    // exact integer triangle counts over the part co-purchase graph
    // (co-occurrence ≥ 2 in the same order); id-oriented enumeration,
    // each triangle exactly once
    "graph_triangle_count" ->
      ("WITH e AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
        "p AS (SELECT a.pk AS s1, b.pk AS s2 FROM e a JOIN e b " +
        "ON a.ok = b.ok AND a.pk < b.pk GROUP BY a.pk, b.pk HAVING count(*) >= 2), " +
        "tri AS (SELECT ab.s1 AS a, ab.s2 AS b, bc.s2 AS c FROM p ab " +
        "JOIN p bc ON ab.s2 = bc.s1 JOIN p ac ON ac.s1 = ab.s1 AND ac.s2 = bc.s2) " +
        "SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM " +
        "(SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) " +
        "GROUP BY node ORDER BY node"),
    // fixed-round k-core peeling, unrolled as chained CTEs (the same
    // 4 rounds the engine runs; a 5th round is a no-op at every SF --
    // the fixpoint is reached); exact integer degrees
    "graph_kcore" ->
      ("WITH e0 AS (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_custkey < 300), " +
        "p AS (SELECT a.supp AS u, b.supp AS v FROM e0 a JOIN e0 b ON a.cust = b.cust AND a.supp < b.supp " +
        "GROUP BY 1, 2 HAVING count(*) >= 3), " +
        "e1 AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p), " +
        "d1 AS (SELECT u, count(*) AS dg FROM e1 GROUP BY u), " +
        "k1 AS (SELECT u FROM d1 WHERE dg >= 3), " +
        "e2 AS (SELECT e.u, e.v FROM e1 e JOIN k1 a ON e.u = a.u JOIN k1 b ON e.v = b.u), " +
        "d2 AS (SELECT u, count(*) AS dg FROM e2 GROUP BY u), " +
        "k2 AS (SELECT u FROM d2 WHERE dg >= 3), " +
        "e3 AS (SELECT e.u, e.v FROM e2 e JOIN k2 a ON e.u = a.u JOIN k2 b ON e.v = b.u), " +
        "d3 AS (SELECT u, count(*) AS dg FROM e3 GROUP BY u), " +
        "k3 AS (SELECT u FROM d3 WHERE dg >= 3), " +
        "e4 AS (SELECT e.u, e.v FROM e3 e JOIN k3 a ON e.u = a.u JOIN k3 b ON e.v = b.u), " +
        "d4 AS (SELECT u, count(*) AS dg FROM e4 GROUP BY u), " +
        "k4 AS (SELECT u FROM d4 WHERE dg >= 3), " +
        "e5 AS (SELECT e.u, e.v FROM e4 e JOIN k4 a ON e.u = a.u JOIN k4 b ON e.v = b.u), " +
        "fin AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree FROM e5 GROUP BY u) " +
        // convergence witness: 4 rounds reached the fixpoint iff round 5
        // would peel nothing ⟺ every surviving degree is already ≥ k
        "SELECT node, degree, min(degree) OVER () >= 3 AS converged FROM fin ORDER BY node"),
    // bounded BFS as a recursive CTE (UNION-distinct keeps the state
    // finite; dist < 3 bounds the walk); min over (node, dist) pairs is
    // the hop distance -- the engine walks the same graph with
    // frontier-only Pregel rounds. Exact integers end to end
    "graph_bfs" ->
      ("WITH RECURSIVE e AS (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_custkey < 300), " +
        "p AS (SELECT a.supp AS u, b.supp AS v FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp " +
        "GROUP BY 1, 2 HAVING count(*) >= 3), " +
        "ed AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p), " +
        "seed AS (SELECT min(u) AS s FROM ed), " +
        "bfs AS (SELECT (SELECT s FROM seed) AS node, 0 AS dist " +
        "UNION SELECT ed.v, bfs.dist + 1 FROM bfs JOIN ed ON ed.u = bfs.node WHERE bfs.dist < 3) " +
        "SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY node ORDER BY node"),
    // tolerance as-of (merge_asof semantics): the unique backward match
    // is inside the window iff any click is — LATERAL with the window
    // bound states it directly; gap and tolerance are exact integer µs
    "join_asof_tolerance" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_um FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, epoch_us(ts) AS c_um, max(event_id) AS click_id FROM events WHERE event_type = 'click' GROUP BY user_id, ts) " +
        "SELECT p.purchase_id, p.user_id, n.click_id, p.p_um - n.c_um AS gap_us " +
        "FROM p LEFT JOIN LATERAL (SELECT click_id, c_um FROM c WHERE c.user_id = p.user_id " +
        "AND c.c_um <= p.p_um AND c.c_um >= p.p_um - 600000000 ORDER BY c.c_um DESC LIMIT 1) n ON true " +
        "ORDER BY purchase_id"),
    // nearest as-of (merge_asof direction='nearest'): latest-at-or-before
    // vs earliest-at-or-after, closer gap wins, tie → backward; all
    // compares exact integer µs
    "join_asof_nearest" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_um FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, epoch_us(ts) AS c_um, max(event_id) AS click_id FROM events WHERE event_type = 'click' GROUP BY user_id, ts) " +
        "SELECT p.purchase_id, p.user_id, " +
        "CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL OR p.p_um - b.c_um <= f.c_um - p.p_um) THEN b.click_id ELSE f.click_id END AS click_id, " +
        "CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL OR p.p_um - b.c_um <= f.c_um - p.p_um) THEN p.p_um - b.c_um ELSE f.c_um - p.p_um END AS gap_us " +
        "FROM p " +
        "LEFT JOIN LATERAL (SELECT click_id, c_um FROM c WHERE c.user_id = p.user_id AND c.c_um <= p.p_um ORDER BY c.c_um DESC LIMIT 1) b ON true " +
        "LEFT JOIN LATERAL (SELECT click_id, c_um FROM c WHERE c.user_id = p.user_id AND c.c_um >= p.p_um ORDER BY c.c_um LIMIT 1) f ON true " +
        "ORDER BY purchase_id"),
    // forward as-of: the engine runs the native backward sorted-merge on
    // NEGATED times; the oracle states it directly as the earliest
    // strictly-after click (ts unique per user, so ≥ and > coincide)
    "join_asof_forward" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_um FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, epoch_us(ts) AS c_um, event_id AS click_id FROM events WHERE event_type = 'click') " +
        "SELECT p.purchase_id, p.user_id, n.click_id, n.c_um - p.p_um AS wait_us " +
        "FROM p LEFT JOIN LATERAL (SELECT click_id, c_um FROM c WHERE c.user_id = p.user_id AND c.c_um >= p.p_um ORDER BY c.c_um LIMIT 1) n ON true " +
        "ORDER BY purchase_id"),
    // first-occurrence flag + cumulative sum — exact integers end to end
    "win_running_distinct" ->
      ("WITH f AS (SELECT event_id, user_id, ts, event_type, " +
        "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first " +
        "FROM events WHERE user_id < 8) " +
        "SELECT event_id, user_id, ts, event_type, " +
        "CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS types_seen " +
        "FROM f ORDER BY event_id"),
    // cumsum split search; the judged shift is the exact cent-lattice
    // numerator |Σpre·(n−i) − Σpost·i| (the ratio lands ON 4-dp half
    // boundaries at sf0.1 — measured); top-2 gap ≥0.007 at every SF
    "ts_changepoint" ->
      ("WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS x FROM events GROUP BY user_id, CAST(ts AS DATE)), " +
        "c AS (SELECT user_id, day, x, " +
        "sum(x) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) AS i, " +
        "sum(x) OVER (PARTITION BY user_id) AS tot, " +
        "count(*) OVER (PARTITION BY user_id) AS n FROM d), " +
        "s AS (SELECT user_id, day, cs, i, tot, n, abs(cs / i - (tot - cs) / (n - i)) AS shift FROM c WHERE i < n), " +
        "r AS (SELECT user_id, day, cs, i, tot, n, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY shift DESC, day DESC) AS rk FROM s) " +
        "SELECT user_id, CAST(day AS TIMESTAMP) AS split_day, CAST(i AS BIGINT) AS i_days, n AS n_days, " +
        "round(abs(cs * (n - i) - (tot - cs) * i), 2) AS shift_num " +
        "FROM r WHERE rk = 1 ORDER BY user_id"),
    // clamped month arithmetic and ISO numeric day/week on both sides
    "fn_date_extras" ->
      ("SELECT o_orderkey, " +
        "CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end, " +
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS next_cycle, " +
        "CAST(quarter(o_orderdate) AS BIGINT) AS q, " +
        "CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS iso_wd, " +
        "CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week " +
        "FROM orders ORDER BY o_orderkey LIMIT 200"),
    // exact integer-µs gap algebra; DuckDB's sum(BIGINT) is HUGEINT →
    // cast; the interpolated median of integers is an exact binary half
    "ts_inter_arrival" ->
      ("WITH t AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events) " +
        "SELECT user_id, count(gap_us) AS n_gaps, min(gap_us) AS min_gap_us, " +
        "max(gap_us) AS max_gap_us, CAST(sum(gap_us) AS BIGINT) AS sum_gap_us, " +
        "quantile_cont(gap_us, 0.5) AS p50_gap_us " +
        "FROM t GROUP BY user_id ORDER BY user_id"),
    // Pearson sample correlation over the lagged daily-total pairs —
    // identically defined on both engines, scale-free, 4-dp rounded
    "ts_autocorr" ->
      ("WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS x FROM events GROUP BY user_id, CAST(ts AS DATE)), " +
        "l AS (SELECT user_id, x, lag(x) OVER (PARTITION BY user_id ORDER BY day) AS xp FROM d) " +
        "SELECT user_id, count(xp) AS n_pairs, round(corr(x, xp), 4) + 0 AS r1 " +
        "FROM l GROUP BY user_id ORDER BY user_id"),
    // LOCF time-weighting in exact integer µs; the unweighted comparison
    // ships as the exact (sum, count) pair — a rounded MEAN of 2-dp data
    // sits exactly on 4-dp half boundaries at sf0.1 (measured)
    // exact cent·µs weighted sum, 4-dp rounding in INTEGER space via
    // the divmod split (round-11; see hrv_rmssd)
    "ts_time_weighted_avg" ->
      ("WITH t AS (SELECT user_id, epoch_us(ts) AS um, CAST(round(value * 100) AS BIGINT) AS c, value, " +
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), " +
        "g AS (SELECT user_id, sum(c * (nxt - um)) AS num, max(um) - min(um) AS span, " +
        "round(sum(value), 2) AS sum_v, count(value) AS n_v FROM t GROUP BY user_id) " +
        "SELECT user_id, CASE WHEN span > 0 THEN CAST((num // span) * 100 + ((num % span) * 200 + span) // (span * 2) AS DOUBLE) / 10000.0 END AS twa, " +
        "span AS span_us, sum_v, n_v " +
        "FROM g ORDER BY user_id"),
    // half-integers (quantity/2) are exact binary, so the four modes
    // disagree by SEMANTICS, not float luck; ceil/floor cast to BIGINT
    "fn_round_modes" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity / 2 AS q2, " +
        "round(l_quantity / 2, 0) AS r_away, round_even(l_quantity / 2, 0) AS r_even, " +
        "CAST(ceil(l_quantity / 2) AS BIGINT) AS c, CAST(floor(l_quantity / 2) AS BIGINT) AS f " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, q2 LIMIT 200"),
    // exact integer algebra, order-insensitive by construction
    "agg_bitops" ->
      ("SELECT l_returnflag, bit_and(l_orderkey) AS band, bit_or(l_orderkey) AS bor, " +
        "bit_xor(l_orderkey) AS bxor, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // the oracle REBUILDS the parts the URL was synthesized from — exact
    // ground truth for parse_url's decomposition on well-formed URLs
    "fn_url" ->
      ("SELECT p_partkey, " +
        "'w' || CAST(p_partkey % 7 AS VARCHAR) || '.example.com' AS host, " +
        "'/cat/' || lower(replace(p_type, ' ', '-')) || '/item' AS path, " +
        "'id=' || CAST(p_partkey AS VARCHAR) || '&brand=' || replace(p_brand, '#', '-') AS query, " +
        "replace(p_brand, '#', '-') AS brand_param " +
        "FROM part ORDER BY p_partkey LIMIT 150"),
    // deterministic md5-bucket negatives (doc_ids are contiguous 0..N-1,
    // verified per sf); self-match remaps to the next id
    "llm_negative_sample" ->
      ("WITH n AS (SELECT count(*) AS c FROM documents), " +
        "e AS (SELECT doc_id, k FROM (SELECT doc_id FROM documents WHERE doc_id < 100) CROSS JOIN (SELECT unnest([1,2,3]) AS k)) " +
        "SELECT doc_id, CAST(k AS BIGINT) AS k, CASE WHEN h = doc_id THEN (h + 1) % c ELSE h END AS neg_id " +
        "FROM (SELECT doc_id, k, ('0x'||substr(md5(doc_id || '-' || k),1,8))::BIGINT % c AS h, c FROM e CROSS JOIN n) " +
        "ORDER BY doc_id, k")
  )
}
