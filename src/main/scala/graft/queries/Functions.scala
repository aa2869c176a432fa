package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar function families + UDF/UDAF/UDTF surface — SURVEY.md §2.B rows
  * B28–B34 and B40–B42.
  *
  * One multi-function query per family. All built-ins stay inside
  * whole-stage codegen; the UDF/UDAF entries exist to cover the extension
  * surface (prefer built-ins in real pipelines — a Scala UDF breaks codegen).
  *
  * Type alignment with the DuckDB oracle: Spark `length`/`year`/`size`
  * return INT where DuckDB returns BIGINT — the oracle SQL casts to INT;
  * Spark `floor`/`ceil`/`unix_timestamp` return BIGINT — the oracle casts
  * up. DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  * replace-all semantics.
  */
object Functions {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B28: string family.
    "fn_string" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pre"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy("p_partkey")),

    // Second string family — the padding/transliteration ops report
    // formatting and key-normalization layers lean on: lpad/rpad
    // (fixed-width keys), translate (char-class mapping without a regex
    // engine), reverse (suffix indexing trick), repeat, ascii and
    // locate. All codegen'd map-side byte ops; the oracle pins the
    // cross-engine spellings (DuckDB strpos == Spark locate, both
    // 1-based with 0 for no match).
    "fn_string_advanced" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_type"), 12, ".").as("type_rpad"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_trans"),
        reverse(col("p_name")).as("name_rev"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        ascii(col("p_name")).as("first_code"),
        locate("widget", col("p_name")).as("pos_widget"))
        .orderBy("p_partkey")),

    // Datetime FORMATTING surface (fn_date/fn_datetime_extract cover
    // extraction; this covers rendering + parse-back): ISO, compact,
    // and zero-padded day-of-year renderings plus a to_date round-trip
    // flag. Patterns stay NUMERIC-ONLY — month/day NAMES are
    // locale-dependent and the portability rule here is the same as the
    // regexp keys' dialect rule. Map-side projection.
    "fn_datetime_format" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_date"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("compact_date"),
        date_format(col("o_orderdate"), "DDD").as("day_of_year"),
        (to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"),
          "yyyy-MM-dd") === to_date(col("o_orderdate")))
          .as("roundtrip_ok"))
        .orderBy("o_orderkey")),

    // Data-masking surface (Spark 3.4 mask()): uppercase→X, lowercase→x,
    // digit→n with the other-chars class preserved, plus a custom
    // upper-char variant — the display-redaction transform PII review
    // tools apply to sample rows (format-preserving, unlike pii_scrub's
    // token replacement). Map-side only; the DuckDB twin is the
    // equivalent regexp_replace chain with the 'g' flag.
    "fn_mask" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        expr("mask(p_brand)").as("brand_masked"),
        expr("mask(p_name)").as("name_masked"),
        expr("mask(p_brand, '*')").as("brand_star"))
        .orderBy("p_partkey")),

    // Regular-expression surface: first-match extract, global replace,
    // match count, and a boolean matcher in one map-side projection.
    // DuckDB's regexp_replace defaults to FIRST-match — the 'g' flag in
    // the twin pins the global semantics Spark uses; patterns stay in
    // the RE2 ∩ java.util.regex common dialect (char classes, anchors —
    // no lookarounds), which is also the portability rule a production
    // pipeline needs between scan pushdown and JVM execution.
    "fn_regexp_family" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        size(expr("regexp_extract_all(p_name, '[a-z]+', 0)"))
          .as("n_words"),
        col("p_name").rlike("^[a-z]").as("starts_alpha"))
        .orderBy("p_partkey")),

    // B29: date/time family.
    "fn_date" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"),
        dayofmonth(col("l_shipdate")).as("dom"),
        date_trunc("month", col("l_shipdate")).as("ship_month"),
        datediff(col("l_shipdate"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        unix_timestamp(col("l_shipdate")).as("unix_ts"))
        .orderBy("l_orderkey", "l_linenumber")),

    // B30: math family.
    "fn_math" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        round(sqrt(col("p_retailprice")), 4).as("sqrt_price"),
        round(log(col("p_retailprice")), 4).as("ln_price"),
        round(exp(col("p_size") / lit(100.0)), 4).as("exp_sz"),
        round(pow(col("p_size"), 2), 1).as("pow_sz"),
        round(abs(col("p_retailprice") - 1000.0), 2).as("abs_diff"),
        floor(col("p_retailprice")).as("flr"),
        ceil(col("p_retailprice")).as("cl"))
        .orderBy("p_partkey")),

    // DataFrameNaFunctions surface — na.fill / na.replace as the user
    // writes them (na.drop is exercised by the spec, whose count must
    // equal the SQL filter). Nulls are CONSTRUCTED deterministically
    // (nullif / key-mod case) so the oracle can mirror them with
    // coalesce/CASE; all map-side.
    "fn_na_family" -> ((s, d) => {
      val withNulls = t(s, d, "part").select(
        col("p_partkey"),
        expr("nullif(p_size, 25)").as("size_filled"),
        expr("CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END")
          .as("brand_filled"))
      withNulls.na
        .fill(Map("size_filled" -> -1, "brand_filled" -> "UNKNOWN"))
        .na.replace("brand_filled", Map("Brand#11" -> "B11"))
        .orderBy("p_partkey")
    }),

    // Trigonometric family — the angle/geometry plumbing fn_math leaves
    // out (fn_geo_family uses haversine internally; this exposes the
    // primitives). All map-side codegen'd; every value is a PER-ROW
    // deterministic function of the data (no aggregation order
    // anywhere), so each engine always produces the same double and the
    // rounded compare is stable.
    "fn_trig_family" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        round(sin(col("p_size") / lit(10.0)), 6).as("sin_v"),
        round(cos(col("p_size") / lit(10.0)), 6).as("cos_v"),
        round(tan(col("p_size") / lit(50.0)), 6).as("tan_v"),
        round(asin(col("p_size") / lit(50.0) - lit(0.5)), 6).as("asin_v"),
        round(atan2(col("p_size").cast("double"),
          col("p_partkey").cast("double")), 6).as("atan2_v"),
        round(degrees(atan(col("p_size") / lit(10.0))), 4).as("deg_v"),
        round(radians(col("p_size").cast("double")), 6).as("rad_v"))
        .orderBy("p_partkey")),

    // try_-prefixed error-safe arithmetic/casts: malformed input yields
    // NULL instead of killing the job — the posture a 100 TB batch needs
    // (one bad row must not fail a 10-hour stage; route nulls to
    // quarantine instead, as scan_csv_malformed does for whole records).
    // All map-side codegen'd; the oracle mirrors each with the
    // equivalent TRY_CAST / NULLIF guard.
    "fn_try_arithmetic" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        expr("try_cast(CASE WHEN p_partkey % 3 = 0 " +
          "THEN CAST(p_partkey AS STRING) ELSE p_name END AS BIGINT)")
          .as("maybe_int"),
        round(expr("try_divide(p_retailprice, p_size - 10)"), 4)
          .as("per_size"),
        expr("try_cast(p_brand AS DOUBLE)").as("brand_num"))
        .orderBy("p_partkey")),

    // Bitwise function family — the hash/partition/bitmap plumbing ops
    // (AND/OR/XOR, shifts, popcount) every masking or bucketing scheme
    // leans on; all codegen'd integer ops, map-side only.
    "fn_bitwise" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        (col("p_partkey").bitwiseAND(255L)).as("band"),
        (col("p_partkey").bitwiseOR(col("p_size").cast("long"))).as("bor"),
        (col("p_partkey").bitwiseXOR(col("p_size").cast("long"))).as("bxor"),
        shiftleft(col("p_partkey"), 4).as("shl"),
        shiftright(col("p_partkey"), 2).as("shr"),
        bit_count(col("p_partkey")).as("pop"))
        .orderBy("p_partkey")),

    // B31: array family over embeddings (higher-order functions). The
    // transform/slice output is unpacked to scalar columns: the driver's
    // pandas comparator cannot hash array cells, and double→string
    // formatting differs across engines, so element extraction is the
    // deterministic projection.
    "fn_array" -> ((s, d) => {
      val head3 = transform(slice(col("embedding"), 1, 3),
        x => round(x.cast("double"), 4))
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4)
          .as("first_val"),
        element_at(head3, 1).as("h3_1"),
        element_at(head3, 2).as("h3_2"),
        element_at(head3, 3).as("h3_3"),
        array_contains(col("embedding"), element_at(col("embedding"), 1))
          .as("has_first"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("esum"))
        .orderBy("vec_id")
    }),

    // B32: map family — JSON string → MapType.
    // Struct-column surface: named_struct construction, dotted field
    // access, and the Spark 3.1+ Column.withField / dropFields mutators
    // — the nested-schema editing API a typed-events pipeline leans on
    // (add a derived field inside the struct, drop a deprecated one,
    // without exploding the struct to top level and rebuilding it).
    // Pure map-side projection; the oracle checks the flattened values
    // and the spec pins the intermediate struct schema (field added,
    // field gone).
    "fn_struct_family" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("bal"),
            col("c_mktsegment").as("seg")).as("st"))
        .select(col("c_custkey"),
          col("st")
            .withField("bal_tier",
              when(col("st.bal") >= 5000.0, "gold").otherwise("std"))
            .dropFields("seg").as("st2"))
        .select(col("c_custkey"), col("st2.name").as("name"),
          round(col("st2.bal"), 2).as("bal"),
          col("st2.bal_tier").as("bal_tier"))
        .orderBy("c_custkey")),

    "fn_map" -> ((s, d) => {
      val m = from_json(col("props"), "map<string,bigint>",
        Map.empty[String, String])
      Tables.events(s, d).select(
        col("event_id"),
        element_at(m, "k").as("k_val"),
        size(m).as("n_keys"),
        concat_ws(",", sort_array(map_keys(m))).as("keys"))
        .orderBy("event_id")
    }),

    // B33: json family.
    "fn_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), "struct<k:bigint>", Map.empty[String, String])
          .getField("k").as("k_typed"))
        .orderBy("event_id")),

    // B63: VARIANT (Spark 4 semi-structured type) — parse once, extract
    // typed fields lazily; the shredding-friendly replacement for
    // repeated get_json_object passes over the same payload.
    "fn_variant" -> ((s, d) => {
      val v = parse_json(col("props"))
      Tables.events(s, d).select(
        col("event_id"),
        variant_get(v, "$.k", "bigint").as("k_big"),
        try_variant_get(v, "$.missing", "string").as("missing_str"),
        is_variant_null(v).as("is_null"))
        .orderBy("event_id")
    }),

    // B64: higher-order function family — exists / forall / filter over
    // the embedding arrays (lambda predicates run inside codegen, no UDF).
    "fn_higher_order" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        exists(col("embedding"), x => x.cast("double") > 0.5).as("has_big"),
        forall(col("embedding"), x => x.cast("double") >= -1.0)
          .as("all_ge_m1"),
        size(filter(col("embedding"), x => x.cast("double") > 0))
          .as("n_pos"))
        .orderBy("vec_id")),

    // B68: fuzzy matching — levenshtein edit distance, the scalar
    // primitive under fuzzy entity resolution / near-key joins.
    "fn_fuzzy_match" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev_bt"),
        levenshtein(substring(col("p_name"), 1, 10),
          substring(col("p_type"), 1, 10)).as("lev_nt"))
        .orderBy("p_partkey")),

    // B69: null semantics under aggregation — count(*) vs count(col),
    // null-skipping sum/avg/min, distinct-with-null; the classic
    // cross-engine divergence area, pinned by the oracle.
    "agg_null_semantics" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(nullif(col("l_returnflag"), lit("N")).as("f"),
          nullif(col("l_quantity") * (col("l_linenumber") % 2), lit(0.0))
            .as("q0"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("f")).as("n_f"),
          countDistinct(col("f")).as("nd_f"),
          round(sum("q0"), 2).as("sum_q0"),
          round(avg("q0"), 2).as("avg_q0"),
          min("q0").as("min_q0"))),

    // B34: conditional / null functions.
    "fn_conditional" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 30, "high")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("low").as("qty_band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
          .as("flag_or_none"),
        coalesce(nullif(col("l_linestatus"), lit("O")), lit("open"))
          .as("status_or_open"))
        .orderBy("l_orderkey", "l_linenumber")),

    // B40: scalar UDF (coverage of the extension surface).
    "udf_scalar" -> ((s, d) => {
      val revLower = udf((x: String) =>
        if (x == null) null else x.toLowerCase.reverse)
      t(s, d, "customer")
        .select(col("c_custkey"), revLower(col("c_name")).as("rev_name"))
        .orderBy("c_custkey")
    }),

    // B41: typed Aggregator UDAF — geometric mean.
    "udaf_aggregator" -> ((s, d) => {
      val geo = udaf(graft.functions.GeoMean)
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(geo(col("l_extendedprice")), 2).as("geo_price"))
        .orderBy("l_returnflag")
    }),

    // B42: generator/UDTF — tokenizer via typed flatMap (the reference's
    // extension point is exactly this shape: Iterator[in] → Iterator[out],
    // IRSSpark.py:260-269).
    "udtf_flatmap" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").select("text").as[String]
        .flatMap(_.toLowerCase.split(" "))
        .toDF("token")
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("token")
    }),

    // URL parse + canonicalization — the first step of every web-corpus
    // pipeline (url dedup keys on the canonical form). URLs are built
    // deterministically from the documents table (mixed-case host, www.
    // prefix on every 3rd doc, query + fragment) so the parse has real
    // work to undo; `parse_url` is a native codegen-adjacent expression,
    // and the whole query is map-side only — no shuffle, scales linearly.
    "fn_url_parse" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("https://"),
            when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
            col("source"), lit(".Example.COM/docs/"), col("doc_id"),
            lit("/view?lang="), col("lang"),
            lit("&ref=r"), col("doc_id") % 7, lit("#sec")).as("url"))
        .select(col("doc_id"), col("url"),
          lower(parse_url(col("url"), lit("HOST"))).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"),
          regexp_replace(lower(parse_url(col("url"), lit("HOST"))),
            "^www\\.", "").as("domain"))
        .orderBy("doc_id")),

    // XML extraction over filing-shaped text — the reference's home turf
    // (IRS 990 filings are XML): a filing-shaped document is built
    // deterministically per row, then parsed ONCE with `from_xml` into a
    // typed struct (attributes via the `_` prefix, repeated <amt> as an
    // array<long>) and every output is a field read off that one struct —
    // attribute, element text, an exact integer array fold for the sum,
    // and size() for the repeated-element count. The earlier xpath_*
    // version re-parsed the same document five times per row (one DOM
    // build per xpath call — measured 3.5→6.6 s creep across rounds);
    // one parse is the only plan that survives 100 TB of real filings.
    // Catalyst keeps the parse single: CollapseProject refuses to inline
    // a non-cheap expression referenced five times, so the struct is
    // materialized once per row inside one codegen stage. The oracle
    // reproduces the expected values from the same source columns (the
    // fn_url_parse discipline — DuckDB has no XML reader, so the
    // CONSTRUCTION is the ground truth and extraction must invert it).
    "fn_xpath" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val filingSchema = StructType(Seq(
        StructField("_id", StringType),
        StructField("org", StructType(Seq(
          StructField("_lang", StringType),
          StructField("name", StringType)))),
        StructField("amts", StructType(Seq(
          StructField("amt", ArrayType(LongType)))))))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          concat(lit("<filing id=\""), col("doc_id"),
            lit("\"><org lang=\""), col("lang"),
            lit("\"><name>"), upper(col("source")),
            lit("</name></org><amts>"),
            lit("<amt>"), col("n_chars"), lit("</amt>"),
            lit("<amt>"), col("doc_id") % 100, lit("</amt>"),
            when(col("doc_id") % 2 === 0,
              concat(lit("<amt>"), col("doc_id") % 7, lit("</amt>")))
              .otherwise(lit("")),
            lit("</amts></filing>")).as("xml"))
        .select(col("doc_id"),
          from_xml(col("xml"), filingSchema).as("p"))
        .select(col("doc_id"),
          col("p._id").as("id_attr"),
          col("p.org.name").as("org_name"),
          col("p.org._lang").as("org_lang"),
          aggregate(col("p.amts.amt"), lit(0L), (acc, x) => acc + x)
            .as("amt_sum"),
          size(col("p.amts.amt")).cast("long").as("n_amts"))
        .orderBy("doc_id")
    }),

    // Calendar-dimension derivation on timestamps — the date-dim columns
    // a warehouse derives once at ingest (quarter, ISO week, day-of-year,
    // weekday, hour). Weekday conventions are ENGINE-SPECIFIC (Spark
    // dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6), so the oracle
    // maps explicitly instead of trusting same-named functions — the
    // classic silent off-by-one in cross-engine migrations. All
    // extractions are codegen'd field reads; map-side only.
    "fn_datetime_extract" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        year(col("ts")).as("yr"),
        quarter(col("ts")).as("qtr"),
        weekofyear(col("ts")).as("iso_week"),
        dayofyear(col("ts")).as("doy"),
        dayofweek(col("ts")).as("dow_sun1"),
        hour(col("ts")).as("hh"),
        unix_timestamp(col("ts")).as("epoch_sec"))
        .orderBy("event_id")),

    // Collation-aware comparison (Spark 4 collations): case-insensitive
    // equality declared as a PROPERTY OF THE KEY via collate(name,
    // 'UTF8_LCASE'), not by rewriting values through lower() — the
    // distinction that matters once collation rules go beyond ASCII
    // case (locale-aware casing, accent-insensitive collations), where
    // a lower() rewrite is simply wrong. The collated distinct-count
    // hashes/compares under the collation inside the normal partial →
    // final aggregate; original strings are never mutated. Case
    // variance is synthesized deterministically on p_type (repeated
    // values — even part keys lower-cased; p_type arrives upper), so
    // brands holding both
    // parities of a type REALLY show n_ci < n_cs. Oracle spells the
    // same semantics the pre-collation way (count distinct lower()) —
    // equal for ASCII data, which is exactly the regime where the
    // rewrite is still sound.
    "fn_collation" -> ((s, d) => {
      val mixed = t(s, d, "part").select(
        col("p_brand"),
        when(col("p_partkey") % 2 === 0, lower(col("p_type")))
          .otherwise(col("p_type")).as("typ"))
      mixed.groupBy("p_brand")
        .agg(
          countDistinct(collate(col("typ"), "UTF8_LCASE")).as("n_ci"),
          countDistinct(col("typ")).as("n_cs"),
          count(lit(1)).as("n_rows"))
        .orderBy("p_brand")
    }),

    // Column-level encryption round-trip: aes_encrypt/aes_decrypt
    // built-ins in deterministic ECB mode (GCM's random IV breaks both
    // reruns and the oracle; ECB is the right fit ONLY for this
    // equality-preserving tokenization use — same plaintext, same
    // ciphertext, joins still work, like pii_pseudonymize but
    // reversible WITH the key). The audited contract: decrypt ∘ encrypt
    // is the identity on every row and the ciphertext never leaks the
    // plaintext bytes (spec); the oracled output is the per-segment
    // round-trip census. The key arrives as a literal HERE; production
    // injects it from a secret store into the session, never the plan.
    "fn_aes_roundtrip" -> ((s, d) => {
      t(s, d, "customer")
        .select(col("c_mktsegment"),
          col("c_custkey").cast("string").as("plain"))
        .withColumn("ct",
          expr("aes_encrypt(plain, 'graft-0123456789', 'ECB')"))
        .withColumn("rt",
          expr("CAST(aes_decrypt(ct, 'graft-0123456789', 'ECB') AS STRING)"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("rt") === col("plain"), 1L).otherwise(0L))
            .as("n_roundtrip"),
          countDistinct(col("ct")).as("n_distinct_ct"))
        .orderBy("c_mktsegment")
    }),

    // Geospatial math family: haversine great-circle distance between
    // synthetic customer coordinates and their nation's centroid, folded
    // to a per-nation distance profile. Coordinates are derived with the
    // repo's md5-char idiom (the schema has no geo columns; the DERIVED
    // values are identical on both engines, which is what the key
    // exercises — the trig/radians chain itself). Everything is a
    // map-side projection over one customer scan plus a broadcast nation
    // dim; the fold is nation-keyed. sin²+cos·cos·sin² is spelled with
    // explicit multiplication (no pow) and the asin argument is clamped
    // with least(1.0, sqrt(...)) so antipodal rounding can't NaN.
    "fn_geo_family" -> ((s, d) => {
      def h3(prefix: String, key: org.apache.spark.sql.Column) = {
        val m = md5(concat(lit(prefix), key.cast("string")))
        ascii(substring(m, 1, 1)) * 65536 +
          ascii(substring(m, 2, 1)) * 256 + ascii(substring(m, 3, 1))
      }
      def lat(p: String, k: org.apache.spark.sql.Column) =
        (h3(p, k) % 18000) / lit(100.0) - lit(90.0)
      def lon(p: String, k: org.apache.spark.sql.Column) =
        (h3(p, k) % 36000) / lit(100.0) - lit(180.0)
      val cust = t(s, d, "customer").select(col("c_custkey"),
        col("c_nationkey"),
        radians(lat("lat:", col("c_custkey"))).as("la1"),
        radians(lon("lon:", col("c_custkey"))).as("lo1"))
      val nat = t(s, d, "nation").select(col("n_nationkey"),
        col("n_name"),
        radians(lat("nlat:", col("n_nationkey"))).as("la2"),
        radians(lon("nlon:", col("n_nationkey"))).as("lo2"))
      val sdLat = sin((col("la2") - col("la1")) / 2)
      val sdLon = sin((col("lo2") - col("lo1")) / 2)
      val km = asin(least(lit(1.0),
        sqrt(sdLat * sdLat + cos(col("la1")) * cos(col("la2")) *
          sdLon * sdLon))) * lit(2 * 6371.0)
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), km.as("km"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"),
          round(avg("km"), 2).as("avg_km"),
          round(max("km"), 2).as("max_km"))
        .orderBy("n_name")
    }),

    // Date-interval arithmetic family: calendar month addition (with the
    // Jan-31 + 1mo → Feb-end clamp both engines share), fixed day
    // offsets, month-end snapping, quarter truncation and day distances
    // — the mutation half of the date surface (fn_date/fn_datetime_extract
    // cover extraction). Pure map-side projections over one scan.
    // Generator surface with a business story: expand each order into a
    // k-installment payment schedule (k = orderkey mod 3 + 1) via
    // sequence() + posexplode — the row-generating half of the function
    // surface (udtf_flatmap covers explode-as-UDTF; this exercises the
    // POSITIONAL generator and calendar arithmetic together). Pure
    // map-side row generation — fan-out ≤ 3×, no exchange at all before
    // the sink. Money is split in INTEGER CENTS (total·100 is within
    // 1e-9 of an integer for 2-decimal prices, so the round is safe on
    // both engines; integer div + last-installment remainder is then
    // exact and order-free) — round(total/k, 2) was measured to flip a
    // half-cent between the engines' rounding paths, the same
    // float-tie class the quantize-to-ten-thousandths idiom avoids.
    // The schedule conserves the order total to the cent (spec-checked).
    "fn_generate_installments" -> ((s, d) => {
      val base = t(s, d, "orders").select(col("o_orderkey"),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int").as("k"),
        to_date(col("o_orderdate")).as("od"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val baseCents = floor(col("cents") / col("k")).cast("long")
      base
        .select(col("o_orderkey"), col("k"), col("od"), col("cents"),
          posexplode(sequence(lit(1), col("k"))).as(Seq("i", "inst_no")))
        .select(col("o_orderkey"), col("inst_no"), col("k").as("n_inst"),
          add_months(col("od"), col("inst_no")).as("due_month"),
          (when(col("inst_no") < col("k"), baseCents)
            .otherwise(col("cents") - (col("k") - 1) * baseCents)
            .cast("double") / 100.0).as("amount"))
        .orderBy("o_orderkey", "inst_no")
    }),

    "fn_interval_family" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        col("o_orderdate"),
        add_months(col("o_orderdate"), 3).as("plus_3mo"),
        date_add(col("o_orderdate"), 45).as("plus_45d"),
        last_day(col("o_orderdate")).as("month_end"),
        trunc(col("o_orderdate"), "quarter").as("q_start"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))
          .cast("int").as("days_to_eoy98"))
        .orderBy("o_orderkey")),
  )

  val oracleSql: Map[String, String] = Map(
    // DuckDB has no AES builtin — the oracle states the CONTRACT the
    // round-trip must satisfy: identity on every row (n_roundtrip =
    // n_rows) and injectivity (distinct ciphertexts = distinct keys).
    // Any Spark-side crypto failure breaks the hash compare.
    "fn_aes_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_rows,
        |       count(*) AS n_roundtrip,
        |       count(DISTINCT c_custkey) AS n_distinct_ct
        |FROM customer
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // pre-collation spelling of case-insensitive distinct: equal to the
    // collated count on ASCII data (see the query's scaladoc)
    "fn_collation" ->
      """WITH m AS (
        |  SELECT p_brand,
        |         CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
        |              ELSE p_type END AS typ
        |  FROM part
        |)
        |SELECT p_brand,
        |       count(DISTINCT lower(typ)) AS n_ci,
        |       count(DISTINCT typ) AS n_cs,
        |       count(*) AS n_rows
        |FROM m GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // DuckDB has no xpath: the deterministic construction is the ground
    // truth and the Spark extraction must invert it (fn_url_parse
    // discipline). amt_sum = n_chars + doc_id%100 (+ doc_id%7 on evens);
    // n_amts counts only non-empty text nodes (xpath text() skips the
    // empty string a 0-valued amt would still emit as <amt>0</amt> —
    // values here are digits, so every node has text).
    "fn_xpath" ->
      """SELECT doc_id,
        |       CAST(doc_id AS VARCHAR) AS id_attr,
        |       upper(source) AS org_name,
        |       lang AS org_lang,
        |       CAST(n_chars + (doc_id % 100) +
        |            CASE WHEN doc_id % 2 = 0 THEN doc_id % 7 ELSE 0 END
        |            AS BIGINT) AS amt_sum,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS BIGINT)
        |         AS n_amts
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_string_advanced" ->
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '*') AS brand_lpad,
        |       rpad(p_type, 12, '.') AS type_rpad,
        |       translate(p_name, 'aeiou', 'AEIOU') AS name_trans,
        |       reverse(p_name) AS name_rev,
        |       repeat(p_brand, 2) AS brand_x2,
        |       CAST(ascii(p_name) AS INT) AS first_code,
        |       CAST(strpos(p_name, 'widget') AS INT) AS pos_widget
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |       lower(p_name) AS name_lower,
        |       upper(p_brand) AS brand_upper,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       substring(p_type, 1, 5) AS type_pre,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       trim('  ' || p_name || '  ') AS name_trim,
        |       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |       string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(year(l_shipdate) AS INT) AS yr,
        |       CAST(month(l_shipdate) AS INT) AS mo,
        |       CAST(day(l_shipdate) AS INT) AS dom,
        |       date_trunc('month', l_shipdate) AS ship_month,
        |       CAST(datediff('day', DATE '1995-01-01', l_shipdate) AS INT)
        |         AS days_since,
        |       CAST(floor(epoch(l_shipdate)) AS BIGINT) AS unix_ts
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_math" ->
      """SELECT p_partkey,
        |       round(sqrt(p_retailprice), 4) AS sqrt_price,
        |       round(ln(p_retailprice), 4) AS ln_price,
        |       round(exp(p_size / 100.0), 4) AS exp_sz,
        |       round(pow(p_size, 2), 1) AS pow_sz,
        |       round(abs(p_retailprice - 1000.0), 2) AS abs_diff,
        |       CAST(floor(p_retailprice) AS BIGINT) AS flr,
        |       CAST(ceil(p_retailprice) AS BIGINT) AS cl
        |FROM part ORDER BY p_partkey""".stripMargin,
    // coalesce/CASE mirror of na.fill + na.replace
    "fn_na_family" ->
      """SELECT p_partkey,
        |       coalesce(nullif(p_size, 25), -1) AS size_filled,
        |       CASE WHEN c = 'Brand#11' THEN 'B11' ELSE c END
        |         AS brand_filled
        |FROM (
        |  SELECT p_partkey, p_size,
        |         coalesce(CASE WHEN p_partkey % 7 = 0 THEN NULL
        |                       ELSE p_brand END, 'UNKNOWN') AS c
        |  FROM part
        |) ORDER BY p_partkey""".stripMargin,
    // per-row trig over the same libm-class primitives as ln/exp above
    "fn_trig_family" ->
      """SELECT p_partkey,
        |       round(sin(p_size / 10.0), 6) AS sin_v,
        |       round(cos(p_size / 10.0), 6) AS cos_v,
        |       round(tan(p_size / 50.0), 6) AS tan_v,
        |       round(asin(p_size / 50.0 - 0.5), 6) AS asin_v,
        |       round(atan2(CAST(p_size AS DOUBLE),
        |                   CAST(p_partkey AS DOUBLE)), 6) AS atan2_v,
        |       round(degrees(atan(p_size / 10.0)), 4) AS deg_v,
        |       round(radians(CAST(p_size AS DOUBLE)), 6) AS rad_v
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_try_arithmetic" ->
      """SELECT p_partkey,
        |       TRY_CAST(CASE WHEN p_partkey % 3 = 0
        |                     THEN CAST(p_partkey AS VARCHAR)
        |                     ELSE p_name END AS BIGINT) AS maybe_int,
        |       round(p_retailprice / nullif(p_size - 10, 0), 4)
        |         AS per_size,
        |       TRY_CAST(p_brand AS DOUBLE) AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT p_partkey,
        |       p_partkey & 255 AS band,
        |       p_partkey | CAST(p_size AS BIGINT) AS bor,
        |       xor(p_partkey, CAST(p_size AS BIGINT)) AS bxor,
        |       CAST(p_partkey << 4 AS BIGINT) AS shl,
        |       CAST(p_partkey >> 2 AS BIGINT) AS shr,
        |       CAST(bit_count(p_partkey) AS INT) AS pop
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |       list_transform(embedding[1:3],
        |         x -> round(CAST(x AS DOUBLE), 4))[1] AS h3_1,
        |       list_transform(embedding[1:3],
        |         x -> round(CAST(x AS DOUBLE), 4))[2] AS h3_2,
        |       list_transform(embedding[1:3],
        |         x -> round(CAST(x AS DOUBLE), 4))[3] AS h3_3,
        |       list_contains(embedding, embedding[1]) AS has_first,
        |       round(list_reduce(CAST(embedding AS DOUBLE[]),
        |         (a, b) -> a + b), 4) AS esum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // strftime twins of the numeric-only Java patterns
    "fn_datetime_format" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
        |       strftime(o_orderdate, '%Y%m%d') AS compact_date,
        |       strftime(o_orderdate, '%j') AS day_of_year,
        |       CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) =
        |         CAST(o_orderdate AS DATE) AS roundtrip_ok
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // equivalent class-by-class regexp_replace chain
    "fn_mask" ->
      """SELECT p_partkey,
        |       regexp_replace(regexp_replace(regexp_replace(p_brand,
        |         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
        |         'g') AS brand_masked,
        |       regexp_replace(regexp_replace(regexp_replace(p_name,
        |         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
        |         'g') AS name_masked,
        |       regexp_replace(regexp_replace(regexp_replace(p_brand,
        |         '[A-Z]', '*', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
        |         'g') AS brand_star
        |FROM part ORDER BY p_partkey""".stripMargin,
    // 'g' flag pins DuckDB's replace to Spark's global semantics
    "fn_regexp_family" ->
      """SELECT p_partkey,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT)
        |         AS n_words,
        |       regexp_matches(p_name, '^[a-z]') AS starts_alpha
        |FROM part ORDER BY p_partkey""".stripMargin,
    // value twin of the struct pipeline (structs are plumbing, the
    // outputs are scalars)
    "fn_struct_family" ->
      """SELECT c_custkey, c_name AS name,
        |       round(c_acctbal, 2) AS bal,
        |       CASE WHEN c_acctbal >= 5000.0 THEN 'gold' ELSE 'std' END
        |         AS bal_tier
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       CAST(len(json_keys(props)) AS INT) AS n_keys,
        |       array_to_string(list_sort(json_keys(props)), ',') AS keys
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_variant" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big,
        |       json_extract_string(props, '$.missing') AS missing_str,
        |       CASE WHEN props IS NULL THEN NULL
        |            ELSE json(props) = 'null' END AS is_null
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_higher_order" ->
      """SELECT vec_id,
        |       len(list_filter(embedding,
        |         x -> CAST(x AS DOUBLE) > 0.5)) > 0 AS has_big,
        |       len(list_filter(embedding,
        |         x -> CAST(x AS DOUBLE) >= -1.0)) = len(embedding)
        |         AS all_ge_m1,
        |       CAST(len(list_filter(embedding,
        |         x -> CAST(x AS DOUBLE) > 0)) AS INT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_fuzzy_match" ->
      """SELECT p_partkey,
        |       CAST(levenshtein(p_brand, p_type) AS INT) AS lev_bt,
        |       CAST(levenshtein(substring(p_name, 1, 10),
        |         substring(p_type, 1, 10)) AS INT) AS lev_nt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "agg_null_semantics" ->
      """SELECT count(*) AS n_rows,
        |       count(f) AS n_f,
        |       count(DISTINCT f) AS nd_f,
        |       round(sum(q0), 2) AS sum_q0,
        |       round(avg(q0), 2) AS avg_q0,
        |       min(q0) AS min_q0
        |FROM (
        |  SELECT nullif(l_returnflag, 'N') AS f,
        |         nullif(l_quantity * (l_linenumber % 2), 0.0) AS q0
        |  FROM lineitem
        |)""".stripMargin,
    "fn_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_quantity > 30 THEN 'high'
        |            WHEN l_quantity > 10 THEN 'mid'
        |            ELSE 'low' END AS qty_band,
        |       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        |       coalesce(nullif(l_linestatus, 'O'), 'open') AS status_or_open
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "udf_scalar" ->
      """SELECT c_custkey, reverse(lower(c_name)) AS rev_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "udaf_aggregator" ->
      """SELECT l_returnflag,
        |       round(exp(avg(ln(l_extendedprice))), 2) AS geo_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_flatmap" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents
        |) GROUP BY token ORDER BY token""".stripMargin,
    "fn_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' ||
        |         CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
        |         source || '.Example.COM/docs/' || doc_id ||
        |         '/view?lang=' || lang || '&ref=r' || (doc_id % 7) ||
        |         '#sec' AS url
        |  FROM documents
        |)
        |SELECT doc_id, url,
        |       lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1))
        |         AS host,
        |       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)
        |         AS path,
        |       regexp_extract(url, '\?([^#]*)', 1) AS query,
        |       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
        |       regexp_replace(
        |         lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
        |         '^www\.', '') AS domain
        |FROM u ORDER BY doc_id""".stripMargin,
    "fn_datetime_extract" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS yr,
        |       CAST(quarter(ts) AS INT) AS qtr,
        |       CAST(weekofyear(ts) AS INT) AS iso_week,
        |       CAST(dayofyear(ts) AS INT) AS doy,
        |       CAST(dayofweek(ts) + 1 AS INT) AS dow_sun1,
        |       CAST(hour(ts) AS INT) AS hh,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec
        |FROM events ORDER BY event_id""".stripMargin,
    // identical md5-char coordinate derivation and haversine spelling
    // (explicit multiplication, least-clamped asin); round(2) absorbs
    // the ≤1-ulp libm sin/cos divergence between the engines
    "fn_geo_family" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    radians((ascii(substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 1)) * 65536 +
        |             ascii(substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 2, 1)) * 256 +
        |             ascii(substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 3, 1))) % 18000
        |            / CAST(100 AS DOUBLE) - 90.0) AS la1,
        |    radians((ascii(substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 1)) * 65536 +
        |             ascii(substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 2, 1)) * 256 +
        |             ascii(substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 3, 1))) % 36000
        |            / CAST(100 AS DOUBLE) - 180.0) AS lo1
        |  FROM customer
        |), nat AS (
        |  SELECT n_nationkey, n_name,
        |    radians((ascii(substr(md5('nlat:' || CAST(n_nationkey AS VARCHAR)), 1, 1)) * 65536 +
        |             ascii(substr(md5('nlat:' || CAST(n_nationkey AS VARCHAR)), 2, 1)) * 256 +
        |             ascii(substr(md5('nlat:' || CAST(n_nationkey AS VARCHAR)), 3, 1))) % 18000
        |            / CAST(100 AS DOUBLE) - 90.0) AS la2,
        |    radians((ascii(substr(md5('nlon:' || CAST(n_nationkey AS VARCHAR)), 1, 1)) * 65536 +
        |             ascii(substr(md5('nlon:' || CAST(n_nationkey AS VARCHAR)), 2, 1)) * 256 +
        |             ascii(substr(md5('nlon:' || CAST(n_nationkey AS VARCHAR)), 3, 1))) % 36000
        |            / CAST(100 AS DOUBLE) - 180.0) AS lo2
        |  FROM nation
        |), km AS (
        |  SELECT n_name,
        |         asin(least(CAST(1 AS DOUBLE),
        |           sqrt(sin((la2 - la1) / 2) * sin((la2 - la1) / 2) +
        |                cos(la1) * cos(la2) *
        |                sin((lo2 - lo1) / 2) * sin((lo2 - lo1) / 2))))
        |           * 12742.0 AS km
        |  FROM cust JOIN nat ON c_nationkey = n_nationkey
        |)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |       round(avg(km), 2) AS avg_km,
        |       round(max(km), 2) AS max_km
        |FROM km GROUP BY n_name ORDER BY n_name""".stripMargin,
    // month-add clamps to month end in both engines; casts pin DATE/INT
    // generate_series + month-interval addition (same end-of-month
    // clamp as Spark add_months) and the same integer-cent split
    "fn_generate_installments" ->
      """WITH base AS (
        |  SELECT o_orderkey, CAST(o_orderkey % 3 + 1 AS INT) AS k,
        |         CAST(o_orderdate AS DATE) AS od,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT o_orderkey, CAST(i AS INT) AS inst_no, k AS n_inst,
        |       CAST(od + i * INTERVAL 1 MONTH AS DATE) AS due_month,
        |       CAST(CASE WHEN i < k THEN cents // k
        |                 ELSE cents - (k - 1) * (cents // k)
        |            END AS DOUBLE) / 100.0 AS amount
        |FROM base, LATERAL (SELECT unnest(generate_series(1, k)) AS i) s
        |ORDER BY o_orderkey, inst_no""".stripMargin,
    "fn_interval_family" ->
      """SELECT o_orderkey, o_orderdate,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
        |       CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS plus_45d,
        |       last_day(o_orderdate) AS month_end,
        |       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        |       CAST(date_diff('day', o_orderdate, DATE '1998-12-31')
        |         AS INT) AS days_to_eoy98
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
