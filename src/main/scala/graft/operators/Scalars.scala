package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar function surface (SURVEY.md §2.8): string / regexp / date / math /
  * conditional / JSON / array functions plus the explode generator. All are
  * built-in codegen'd expressions — no UDFs anywhere on this path.
  *
  * Type notes: Spark's `length`/`size` return INT where the oracle dialect
  * returns BIGINT, so those are cast to long; 1-based `element_at` and
  * 1-based `substring` already agree across engines (SURVEY §7 hazards).
  */
object Scalars {

  /** #36 upper / substring / length / concat / replace. */
  def fnString(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("u"),
        substring(col("c_name"), 10, 9).as("tail"),
        length(col("c_name")).cast("long").as("ln"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cc"),
        expr("replace(c_name, 'Customer', 'Cust')").as("rp"))
      .orderBy(col("c_custkey"))
      .limit(100)

  /** #36b (added round 9) the second string-function tier: pad / split /
    * slice / translate / find / repeat — the id-formatting and
    * field-extraction verbs ETL leans on between the #36 basics and
    * full regexp. All codegen'd built-ins; `instr` is cast to long
    * (Spark INT vs oracle BIGINT). */
  def fnStringExtras(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
        expr("split_part(c_name, '#', 2)").as("numpart"),
        expr("left(c_mktsegment, 4)").as("seg4"),
        expr("right(c_name, 3)").as("tail3"),
        translate(col("c_name"), "#", "-").as("dashed"),
        instr(col("c_name"), "#").cast("long").as("hashpos"),
        expr("repeat(left(c_mktsegment, 1), 3)").as("tri"))
      .orderBy(col("c_custkey"))
      .limit(100)

  /** #40c (added round 9) TRY_CAST: malformed input → NULL, not a job
    * failure — the boundary contract a 100 TB load needs (one bad cell
    * must never kill the batch; the quarantine path in sources/Ingest
    * rides the same semantics). Exercises string→int on mixed
    * valid/invalid cells, string→date on garbage, and string→double on
    * synthesized decimals. */
  def fnTryCast(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("try_cast(CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS STRING) " +
          "ELSE lang END AS INT)").as("maybe_int"),
        expr("try_cast(lang AS DATE)").isNull.as("bad_date"),
        expr("try_cast(concat(CAST(doc_id AS STRING), '.5') AS DOUBLE)").as("frac"))
      .orderBy(col("doc_id"))
      .limit(200)

  /** #37 regexp_extract with capture group (no-match → '' in both engines). */
  def fnRegexp(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"))
      .orderBy(col("p_partkey"))
      .limit(200)

  /** #38 year / month / date_trunc / interval arithmetic. */
  def fnDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        // cast to NTZ: the source column is parquet-naive (read as NTZ) but
        // date_trunc returns tz-adjusted TIMESTAMP; the oracle output is naive
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("mt"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due"))
      .orderBy(col("o_orderkey"))
      .limit(200)

  /** #39 sqrt / ln / abs / ceil / floor / mod. Spark `log` IS natural log
    * (= oracle `ln`); ceil/floor already return BIGINT. */
  def fnMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        abs(col("l_discount") - 0.05).as("ab"),
        ceil(col("l_quantity")).as("ce"),
        floor(col("l_quantity")).as("fl"),
        (col("l_quantity").cast("int") % 7).as("md"))
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .limit(200)

  /** #39b bitwise AND / OR / XOR / shifts — the band-assignment and
    * hash-mixing primitives every LSH/fingerprint operator leans on
    * ([[graft.operators.ScalableDedup]], SimHash), judged here on their
    * own. All codegen'd long arithmetic; int literals promote to long on
    * both engines. The deterministic order needs `xr` as a tiebreak:
    * (l_orderkey, l_linenumber) is not unique in this data. */
  def fnBitwise(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(255)).as("bnd"),
        col("l_orderkey").bitwiseOR(lit(15)).as("orr"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("xr"),
        shiftleft(col("l_orderkey"), 2).as("shl"),
        shiftright(col("l_orderkey"), 3).as("shr"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("xr"))
      .limit(200)

  /** #40 CASE WHEN ladder + coalesce + nullif. */
  def fnCaseCoalesce(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        expr("coalesce(nullif(o_orderstatus, 'O'), 'OPEN')").as("st"))
      .orderBy(col("o_orderkey"))
      .limit(200)

  /** #40b binary encodings: base64 / hex / md5 over string payloads —
    * the serialization surface the multimodal binary columns ride on
    * ([[graft.multimodal.Multimodal]] payloads travel as base64 in JSON
    * sidecars, signatures as hex). Both engines emit uppercase
    * no-leading-zero hex for integers and RFC 4648 base64. */
  def fnBinhex(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        base64(col("c_name").cast("binary")).as("b64"),
        hex(col("c_custkey")).as("hx"),
        md5(col("c_name").cast("binary")).as("h5"))
      .orderBy(col("c_custkey"))
      .limit(100)

  /** #41 JSON field extraction from a string column. */
  def fnJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))
      .limit(500)

  /** #41b structured JSON parsing: `from_json` with an EXPLICIT schema
    * into a struct — the other half of the JSON surface next to #41's
    * single-key `get_json_object`, and the first thing a pipeline does
    * to a JSON column at scale (one parse, many field reads, schema
    * enforced at the boundary instead of per-extraction). The schema
    * deliberately includes a key absent from the data (`tag`) to pin
    * the missing-key contract: absent field → NULL, handled here with
    * `coalesce`. All codegen'd (`JsonToStructs` + struct field access —
    * no UDF). */
  def fnJsonStruct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT, tag STRING")).as("j"))
      .select(col("event_id"),
        col("j.k").as("k"),
        coalesce(col("j.tag"), lit("untagged")).as("tag"))
      .orderBy(col("event_id"))
      .limit(500)

  /** #42 split → array; size; first element (1-based element_at). */
  def fnArray(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        element_at(split(col("text"), " "), 1).as("first_word"))
      .orderBy(col("doc_id"))
      .limit(200)

  /** #42b (added round 9) higher-order array lambdas — `filter`,
    * `transform`, `aggregate` with real lambda arguments, the API a
    * pipeline reaches for before exploding anything: per-doc long-word
    * count, mean word length (lambda-summed), longest word. All three
    * run inside whole-stage codegen over the array without
    * materializing an exploded row per token — at corpus scale that is
    * |docs| rows through the pipeline instead of |tokens|. */
  def fnArrayLambda(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        size(filter(words, w => length(w) > 5)).cast("long").as("n_long"),
        round(
          aggregate(transform(words, w => length(w)), lit(0),
            (acc, x) => acc + x).cast("double") / size(words), 4)
          .as("avg_len"),
        array_max(transform(words, w => length(w))).cast("long").as("max_len"))
      .orderBy(col("doc_id"))
  }

  /** #159 MAP-typed column surface — `map_from_entries`, `element_at`,
    * `map_values`/`map_filter` with real lambdas, `size` — the typed
    * key→value shape feature pipelines carry per-entity feature bags
    * in. Per user: the event-type→count map is BUILT from an
    * aggregated entry list (sorted first — `collect_list` order is
    * partition-dependent, and a map built from a sorted entry array is
    * deterministic), then probed (`element_at` → null on absent key),
    * folded (total = lambda-sum over `map_values`), and filtered
    * (`map_filter` keeps hot types). The map itself never leaves the
    * query — every output column is a scalar, so the oracle replays
    * the same values relationally (the `scan_zorder_pruned` trick:
    * engine-side machinery, machinery-blind oracle). Scale shape: one
    * shuffle on (user, type), one on user; the map work is all
    * codegen'd expressions over ≤|event types| entries per row. */
  def fnMap(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(col("user_id"),
        element_at(col("m"), "purchase").as("purchases"),
        element_at(col("m"), "click").as("clicks"),
        size(col("m")).cast("long").as("n_types"),
        aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x).as("total"),
        size(map_filter(col("m"), (_, v) => v > 5)).cast("long").as("n_hot"))
      .orderBy(col("user_id"))

  /** #43b posexplode: tokenization WITH position — the generator shape
    * when order matters (training pipelines need token offsets, not
    * bags; chunk assembly and span labeling both key on position).
    * 1-based to match the oracle's `range(1, n+1)` ordinals; pos cast to
    * long (Spark's posexplode emits INT ordinals, the oracle BIGINT). */
  def fnPosexplode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
      .orderBy(col("doc_id"), col("pos"))

  /** #43 explode generator → word count (canonical UDTF shape). */
  def fnExplodeWordcount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(50)

  /** #108 calendar navigation extras beyond #38's extract/trunc/diff:
    * month-end (`last_day`), clamped month arithmetic (`add_months` —
    * Jan 31 + 1 month = Feb 29, the billing-cycle rule both engines
    * implement by clamping), quarter, ISO weekday (Spark `weekday` is
    * 0=Monday ↔ DuckDB `isodow`−1 — the named-day functions disagree
    * across locales, the numeric ISO form doesn't), and ISO week
    * number. Date outputs ship as midnight timestamps per the judged
    * convention. Pure codegen'd map stage. */
  def fnDateExtras(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end"),
        add_months(col("o_orderdate"), 1).cast("timestamp_ntz").as("next_cycle"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        weekday(col("o_orderdate")).cast("long").as("iso_wd"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"))
      .orderBy(col("o_orderkey"))
      .limit(200)

  /** #102 rounding-mode semantics probe: HALF-AWAY-FROM-ZERO (`round`)
    * vs HALF-TO-EVEN banker's rounding (`bround` ↔ DuckDB
    * `round_even`) vs ceil/floor, exercised where they actually
    * disagree — exact binary half-integers (quantity/2), so the
    * comparison is semantics, not float luck. Financial aggregation
    * pipelines live or die on this distinction; ceil/floor are cast to
    * BIGINT on both sides (Spark's ceil(double) is already integral).
    * Pure codegen'd map stage. */
  def fnRoundModes(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") / 2).as("q2"))
      .select(col("l_orderkey"), col("l_linenumber"), col("q2"),
        round(col("q2"), 0).as("r_away"),
        bround(col("q2"), 0).as("r_even"),
        ceil(col("q2")).as("c"),
        floor(col("q2")).as("f"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("q2"))
      .limit(200)

  /** #95 URL decomposition (`parse_url` HOST / PATH / QUERY + keyed
    * query-parameter extraction) — the crawl-corpus normalization
    * primitive: a 100 TB web scrape dedups and shards on registrable
    * host and canonical path long before any text analysis. URLs are
    * synthesized from part rows (the corpus has no native URL column),
    * so the oracle can rebuild the identical strings and take them apart
    * with regexes; on well-formed http(s) URLs the two decompositions
    * agree exactly. All codegen'd string ops, no UDFs. */
  def fnUrl(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        concat(lit("https://w"), (col("p_partkey") % 7).cast("string"),
          lit(".example.com/cat/"),
          lower(replace(col("p_type"), lit(" "), lit("-"))),
          lit("/item?id="), col("p_partkey").cast("string"),
          lit("&brand="), replace(col("p_brand"), lit("#"), lit("-"))).as("url"))
      .select(col("p_partkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("brand")).as("brand_param"))
      .orderBy(col("p_partkey"))
      .limit(150)

  /** #208 TIME-ZONE conversion semantics (round-13) — the calendar
    * surface #38/#108 never touched and every cross-region ETL hits on
    * day one: UTC instants rendered as local wall time
    * (`from_utc_timestamp`) and local wall times resolved back to UTC
    * (`to_utc_timestamp`), against DuckDB's ICU `timezone()` on the
    * same IANA zone names. Zones are chosen to prove a REAL tz
    * database is consulted, not an offset table: America/New_York
    * (negative, DST-carrying), Asia/Tokyo (no DST), Asia/Kathmandu
    * (+05:45 — a half-quarter-hour offset no naive arithmetic
    * produces), and the derived local HOUR for the bucketing-by-local-
    * day shape real pipelines shard on. All codegen'd; per-row map. */
  def fnTimezone(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") <= 200)
      .select(col("event_id"),
        // ntz casts: the judged output convention (naive, like DuckDB)
        col("ts").cast("timestamp_ntz").as("ts"),
        from_utc_timestamp(col("ts"), "America/New_York")
          .cast("timestamp_ntz").as("ny_wall"),
        from_utc_timestamp(col("ts"), "Asia/Tokyo")
          .cast("timestamp_ntz").as("tokyo_wall"),
        from_utc_timestamp(col("ts"), "Asia/Kathmandu")
          .cast("timestamp_ntz").as("ktm_wall"),
        to_utc_timestamp(col("ts"), "America/New_York")
          .cast("timestamp_ntz").as("ny_as_utc"),
        hour(from_utc_timestamp(col("ts"), "America/New_York"))
          .cast("long").as("ny_hour"))
      .orderBy(col("event_id"))

  /** #201 row-level DECIMAL money semantics — the first judged probe of
    * exact-decimal arithmetic (round-12 verdict gap #1: every real ETL
    * pipeline hits DECIMAL immediately; the testdata carries doubles, so
    * the cast INTO decimal is part of the judged surface). Per part:
    * cast the 2-dp price to DECIMAL(12,2), then exercise the core
    * decimal ops — scale-widening addition (2 dp + 3 dp → exact 3 dp),
    * multiplication (scales ADD: 2 dp × 1 dp → exact 3 dp), HALF_UP
    * rounding at a scale where exact .x50 ties genuinely occur (prices
    * ending .50 × 1.1 land exactly on the 1-dp boundary, so the hash
    * proves both engines round ties identically — half-up/away for
    * positive values), and floor/ceil to integers. Every decimal output
    * is cast to an EXPLICIT precision/scale and then to STRING: DuckDB's
    * pandas bridge degrades decimals to float64, so the scale-pinned
    * string ("101.10", not 101.1) is the only representation the hash
    * gate can compare exactly — and it is also the stricter test, since
    * a wrong result scale changes the string even when the value is
    * numerically right. Literals are java.math.BigDecimal, not doubles,
    * so they enter the plan as exact DecimalType literals. */
  def fnDecimal(s: SparkSession, d: String): DataFrame = {
    val dp = col("p_retailprice").cast("decimal(12,2)")
    val halfCent = lit(new java.math.BigDecimal("0.005"))
    val tax = lit(new java.math.BigDecimal("1.1"))
    Tables.part(s, d)
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        dp.cast("string").as("price_d"),
        (dp + halfCent).cast("decimal(14,3)").cast("string").as("plus_half_cent"),
        (dp * tax).cast("decimal(15,3)").cast("string").as("taxed"),
        round(dp * tax, 1).cast("decimal(14,1)").cast("string").as("taxed_r1"),
        floor(dp).cast("long").as("price_floor"),
        ceil(dp).cast("long").as("price_ceil"))
      .orderBy(col("p_partkey"))
  }

  /** #211 DECIMAL division semantics (round-14) — the one decimal
    * operator #201 left out, and the one where engines genuinely
    * diverge: Spark's decimal `/` keeps DECIMAL with the SQL-Server
    * result-scale rule `max(6, s1 + p2 + 1)` (adjusted under
    * spark.sql.decimalOperations.allowPrecisionLoss when the raw
    * precision would exceed 38 — RelationalEdgeSpec pins that
    * boundary), while DuckDB's decimal `/` promotes to DOUBLE. The
    * judged surface is therefore the VALUE at a pinned scale, not the
    * engine-internal type: every quotient is cast to an explicit
    * DECIMAL(20,6) and rendered as a scale-pinned string, and the
    * divisors (7, 1.5, 0.25) are chosen so the true quotients' 6-dp
    * digit is provably far from a rounding boundary (repeating tails
    * of /7 and /3 cycle through digits ≥ 1e-1 away from a half-ulp at
    * scale 6; /0.25 is exact), so half-up-on-exact-decimal (Spark)
    * and round-nearest-on-double-then-cast (DuckDB) agree on every
    * row. `try_divide` by an exact decimal zero pins the null-not-
    * error contract (`NULLIF` replays it in SQL). All codegen'd
    * per-row arithmetic — no shuffle beyond the output sort. */
  def fnDecimalDiv(s: SparkSession, d: String): DataFrame = {
    val dp = col("p_retailprice").cast("decimal(12,2)")
    def bd(v: String) = lit(new java.math.BigDecimal(v))
    def pin(c: Column) = c.cast("decimal(20,6)").cast("string")
    Tables.part(s, d)
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        dp.cast("string").as("price_d"),
        pin(dp / bd("7")).as("div_7"),
        pin(dp / bd("1.5")).as("div_1_5"),
        pin(dp / bd("0.25")).as("div_quarter"),
        pin(try_divide(dp, bd("0.00"))).as("div_zero"))
      .orderBy(col("p_partkey"))
  }
}
