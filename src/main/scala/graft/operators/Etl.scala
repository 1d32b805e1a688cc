package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det._

/** ETL / per-row derivation catalog — SURVEY.md §2.2–2.3 and §2.9: dedup
  * survivor semantics, null-tolerant validity filters, null handling,
  * when/otherwise decode chains, datetime decomposition, string functions,
  * JSON extraction. All expressed as native Column expressions (no UDFs;
  * SURVEY.md §2.12 rebuild policy), so everything stays inside
  * whole-stage codegen and pushes into the parquet scan where possible.
  */
object Etl {

  /** U1 deterministic dedup: first order per customer by (date, key) via
    * row_number()=1 — the deterministic-survivor variant of
    * dropDuplicates. Ref: /root/reference/code/01_DataPreprocessing.scala:31. */
  def dedupFirstOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** U1 arbitrary-survivor twin: dropDuplicates on the dedup key. WHICH row
    * survives is partition-order-dependent, but these aggregates are
    * survivor-INDEPENDENT (row count = distinct keys; every survivor carries
    * a distinct custkey; min/max over survivors' keys = min/max over
    * distinct keys), so the entry is fully oracle-able after all:
    * DuckDB computes the same invariants straight from `orders`. */
  def dedupDropDuplicates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .dropDuplicates(Seq("o_custkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_keys"),
        min(col("o_custkey")).as("min_key"),
        max(col("o_custkey")).as("max_key"))

  /** F1–F4 null-tolerant validity filter, mirroring the reference's
    * `isNull || bounds` salary guards. Nulls are introduced via NULLIF
    * (testdata has none), then rows pass when the value is null OR in
    * range — SQL 3-valued logic preserved end to end.
    * Ref: /root/reference/code/01_DataPreprocessing.scala:42-46. */
  def validityFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("tax_n", nullif(col("l_tax"), lit(0.0)))
      .withColumn("disc_n", nullif(col("l_discount"), lit(0.0)))
    li.filter(
        (col("tax_n").isNull || (col("tax_n") > 0.0 && col("tax_n") <= 0.06)) &&
        (col("disc_n").isNull || col("disc_n") <= 0.08) &&
        col("l_quantity") > 0.0)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("tax_n")).as("n_tax_present"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** D1–D3 null handling: na.fill / coalesce / null-preserving flag.
    * Ref: /root/reference/code/01_DataPreprocessing.scala:39,239-248. */
  def nullHandling(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      // introduce nulls deterministically: zero-valued and error events lose `value`
      .withColumn("value_n", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
    val filled = e.na.fill(Map("value_n" -> 0.0))
      .withColumnRenamed("value_n", "value_filled")
    filled
      .withColumn("value_coalesced", coalesce(nullif(col("value_filled"), lit(0.0)), lit(-1.0)))
      // null-preserving ternary flag (reference keeps null, does NOT default to 0)
      .withColumn("is_big",
        when(col("value_filled") > 100.0, lit(1))
          .when(col("value_filled") > 0.0, lit(0))
          .otherwise(lit(null).cast("int")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value_filled")).as("sum_filled"),
        count(col("is_big")).as("n_flagged"),
        sum(col("is_big")).cast("long").as("n_big"))
      .orderBy(col("event_type"))
  }

  /** X8 when/otherwise decode chains: multi-branch priority decode plus
    * price bucketing (the reference's 19-branch state decode shape).
    * Ref: /root/reference/code/01_DataPreprocessing.scala:268-295. */
  def caseWhenBuckets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val decoded = o
      .withColumn("priority_class",
        when(col("o_orderpriority") === "1-URGENT", "critical")
          .when(col("o_orderpriority") === "2-HIGH", "elevated")
          .when(col("o_orderpriority") === "3-MEDIUM", "normal")
          .when(col("o_orderpriority") === "4-NOT SPECIFIED", "unspecified")
          .when(col("o_orderpriority") === "5-LOW", "relaxed")
          .otherwise("unknown"))
      .withColumn("price_bucket",
        when(col("o_totalprice") < 100.0, "xs")
          .when(col("o_totalprice") < 1000.0, "s")
          .when(col("o_totalprice") < 5000.0, "m")
          .when(col("o_totalprice") < 20000.0, "l")
          .otherwise("xl"))
    decoded.groupBy(col("priority_class"), col("price_bucket"))
      .agg(count(lit(1)).as("n_orders"), davg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("priority_class"), col("price_bucket"))
  }

  /** X9/X10 datetime decomposition + epoch round-trip (UTC pinned).
    * Spark dayofweek is Sunday=1; the oracle compensates (+1 on DuckDB's
    * Sunday=0). Ref: /root/reference/code/01_DataPreprocessing.scala:52-63,255-258. */
  def datetimeParts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .withColumn("order_month", month(col("o_orderdate")).cast("long"))
      .withColumn("order_dow", dayofweek(col("o_orderdate")).cast("long"))
      .withColumn("epoch_ms", unix_millis(col("o_orderdate").cast("timestamp")))
      // round-trip: epoch millis → timestamp → month must be stable
      .withColumn("rt_month", month(timestamp_millis(col("epoch_ms"))).cast("long"))
      .groupBy(col("order_year"), col("order_month"), col("order_dow"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("rt_month") === col("order_month"), 1L).otherwise(0L)).as("n_roundtrip_ok"))
      .orderBy(col("order_year"), col("order_month"), col("order_dow"))
  }

  /** X1–X7 string functions: split/element_at/size/length/upper/substring/
    * regexp_replace over part names and types.
    * Ref: /root/reference/code/01_DataPreprocessing.scala:152-158,269-300. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.withColumn("type_tokens", split(col("p_type"), " "))
      .withColumn("type_last", element_at(col("type_tokens"), -1))
      .withColumn("type_first", element_at(col("type_tokens"), 1))
      .withColumn("n_tokens", size(col("type_tokens")).cast("long"))
      .withColumn("name_upper", upper(col("p_name")))
      .withColumn("name_len", length(col("p_name")).cast("long"))
      .withColumn("name_squashed", regexp_replace(col("p_name"), "[aeiou]", ""))
      // second-to-last token (negative non-unit index, ref 01:154)
      .withColumn("name_neg2", element_at(split(col("p_name"), " "), -2))
      .groupBy(col("type_last"))
      .agg(
        count(lit(1)).as("n_parts"),
        max(col("n_tokens")).as("max_tokens"),
        davg(col("name_len")).as("avg_name_len"),
        min(col("name_squashed")).as("min_squashed"),
        min(col("name_neg2")).as("min_neg2"))
      .orderBy(col("type_last"))
  }

  /** X8 as DATA instead of code: the reference's 19-branch when-chain
    * decode re-expressed as a broadcast lookup dimension + left join —
    * the shape that scales to decode tables too wide to inline (SURVEY
    * X8 suggestion). Unmatched codes fall back to 'unknown' exactly like
    * the chain's otherwise().
    * Ref: /root/reference/code/01_DataPreprocessing.scala:275-295. */
  def decodeDim(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val dim = spark.createDataFrame(Seq(
      ("1-URGENT", "critical"), ("2-HIGH", "elevated"), ("3-MEDIUM", "normal"),
      ("4-NOT SPECIFIED", "unspecified"), ("5-LOW", "relaxed")
    )).toDF("o_orderpriority", "priority_class")
    o.join(broadcast(dim), Seq("o_orderpriority"), "left")
      .withColumn("priority_class", coalesce(col("priority_class"), lit("unknown")))
      .groupBy(col("priority_class"))
      .agg(count(lit(1)).as("n_orders"), davg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("priority_class"))
  }

  /** X6 prefix matching: `startsWith` decode chain — the reference's
    * city-prefix → state decode ("SAN FRANCISCO…" → CA) re-expressed as
    * part-name prefix → class. `Column.startsWith` compiles to the same
    * codegen'd StartsWith predicate as `LIKE 'x%'`, so it stays inside
    * whole-stage codegen and is pushdown-eligible.
    * Ref: /root/reference/code/01_DataPreprocessing.scala:268-295. */
  def prefixDecode(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.withColumn("name_class",
        when(col("p_name").startsWith("small") || col("p_name").startsWith("large"), "size")
          .when(col("p_name").startsWith("hot") || col("p_name").startsWith("cold"), "temp")
          .when(col("p_name").startsWith("red") || col("p_name").startsWith("blue"), "color")
          .when(col("p_name").startsWith("old") || col("p_name").startsWith("new"), "age")
          .otherwise("other"))
      .groupBy(col("name_class"))
      .agg(
        count(lit(1)).as("n_parts"),
        davg(col("p_retailprice")).as("avg_price"),
        min(col("p_name")).as("first_name"))
      .orderBy(col("name_class"))
  }

  /** JSON extraction (X-gap; harness events.props is a JSON string): both
    * access paths — path-probe `get_json_object` AND schema-declared
    * `from_json` into a struct (the scale-preferred form: one parse,
    * pruned struct fields, typed columns) — cross-checked in-plan.
    * SURVEY.md §7.5 multimodal/JSON column handling. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("parsed",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .withColumn("k_struct", col("parsed.k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        // both parse paths must agree row-by-row
        sum(when(col("k") <=> col("k_struct"), 1L).otherwise(0L)).as("n_paths_agree"))
      .orderBy(col("event_type"))
  }

  /** MapType surface: build a map column from scalar pairs, then key
    * access (`element_at`) and introspection (`map_keys`/`size`) — the
    * column-type family the rest of the catalog doesn't otherwise touch.
    * The oracle states the expected SEMANTICS directly (element_at of the
    * just-built map IS the status column; the map has exactly 2 keys)
    * rather than routing through DuckDB's MAP dialect, whose extract
    * returns changed shapes across versions. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.withColumn("m", map(
        lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority")))
      .withColumn("status_v", element_at(col("m"), "status"))
      .withColumn("prio_v", element_at(col("m"), "prio"))
      .withColumn("n_keys", size(map_keys(col("m"))).cast("long"))
      .groupBy(col("status_v"), col("prio_v"))
      .agg(count(lit(1)).as("n_orders"), max(col("n_keys")).as("max_keys"))
      .orderBy(col("status_v"), col("prio_v"))
  }

  /** Semi-structured VARIANT path (Spark 4): `parse_json` once into the
    * shredded binary VARIANT encoding, then typed `variant_get` path
    * access — the scale-preferred successor to per-access
    * `get_json_object` text re-parsing (one parse per row, typed
    * extraction, no string round-trips). The VARIANT itself stays
    * intermediate (it has no stable external serialization to compare);
    * the oracle checks the extracted values, which must equal the plain
    * JSON-path numbers DuckDB reads. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "bigint"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Array higher-order functions (X-surface breadth): transform / filter /
    * exists / aggregate / zip_with over the embedding vectors — the
    * codegen'd per-row array algebra a feature pipeline runs before any
    * shuffle. All folds are sequential left-to-right over array<double>
    * (cast FIRST, see VectorOps scaladoc), so every double is bit-exact
    * reproducible by DuckDB's list_reduce/list_transform twins — no
    * rounding anywhere. Embarrassingly parallel: one projection, no
    * shuffle before the output sort. */
  def arrayHof(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(v).cast("long").as("n_dims"),
        size(filter(v, x => x > 0.0)).cast("long").as("n_pos"),
        exists(v, x => abs(x) > lit(2.0)).as("any_big"),
        aggregate(v, lit(0.0), (acc, x) => acc + x).as("sum_all"),
        aggregate(zip_with(v, v, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
          .as("sum_sq"),
        aggregate(
          transform(v, x => when(x > 1.0, 1.0).when(x < -1.0, -1.0).otherwise(x)),
          lit(0.0), (acc, x) => acc + x).as("clip_sum"))
      .orderBy(col("vec_id"))
  }

  /** MERGE-style upsert without a table format: apply a changeset (updates
    * + inserts) onto a base relation — matched keys take the update row,
    * unmatched base rows survive, new keys append. The merge core is
    * base LEFT-ANTI changeset ∪ changeset: one shuffle join on the key,
    * no window, no driver state — the shape a 100 TB nightly merge needs
    * when Delta/Iceberg isn't available. The changeset here is derived
    * deterministically from the base (keys ≡0 mod 10 get status 'U' and a
    * +1.0 price adjustment; keys ≡0 mod 1000 also spawn an insert under a
    * disjoint key range) so the result is oracle-checkable. */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"),
        (col("o_totalprice") + lit(1.0)).as("o_totalprice"))
    val inserts = base.filter(col("o_orderkey") % 1000 === 0)
      .select((col("o_orderkey") + lit(5000000000L)).as("o_orderkey"),
        col("o_custkey"), lit("N").as("o_orderstatus"), col("o_totalprice"))
    val changes = updates.unionByName(inserts)
    base.join(changes.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(changes)
      .orderBy(col("o_orderkey"))
  }

  /** CDC change-log apply — the Debezium/Delta-CDF consumer next to
    * `etl_upsert_merge`'s single-batch upsert: a log of (key, lsn, op)
    * rows with op ∈ {U, D} plus inserts is folded onto the base snapshot
    * by MAX-LSN-WINS per key, with the three hazards a real applier must
    * survive engineered into the log:
    *  - superseded updates (keys %7: U@lsn1 then U@lsn2 — only lsn2's
    *    values may appear),
    *  - cross-op ordering (keys %11: D@lsn3, which on keys %77 ALSO have
    *    both updates — the delete must win, the row must vanish),
    *  - at-least-once redelivery (keys %13: the same U@lsn1 row shipped
    *    twice — apply must be idempotent, no double effect).
    * The fold is one per-key `row_number` over (lsn DESC, tiebreak) —
    * redelivered duplicates are byte-identical so any deterministic pick
    * is the same row — then survivors minus deletes union the untouched
    * base (anti-join). No windows over the base table: the log is
    * typically ≪ the snapshot, and the base-side work is one key join.
    *
    * Scale: shuffle keys are the table key on both sides; the window
    * runs on the LOG only (partition = key, a handful of rows each);
    * AQE picks broadcast when a day's log is small. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    def change(filt: Column, lsn: Long, op: String, dPrice: Double) = base
      .filter(filt)
      .select(col("o_orderkey"), lit(lsn).as("lsn"), lit(op).as("op"),
        col("o_custkey"), lit("C").as("o_orderstatus"),
        (col("o_totalprice") + lit(dPrice)).as("o_totalprice"))
    val u1 = change(col("o_orderkey") % 7 === 0, 1L, "U", 1.0)
    val u2 = change(col("o_orderkey") % 7 === 0, 2L, "U", 2.0)
    val del = change(col("o_orderkey") % 11 === 0, 3L, "D", 0.0)
    val dup = change(col("o_orderkey") % 13 === 0, 1L, "U", 5.0)
    val log = u1.unionByName(u2).unionByName(del)
      .unionByName(dup).unionByName(dup) // shipped twice: at-least-once
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("lsn").desc, col("op"), col("o_totalprice"))
    val effective = log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val survivors = effective.filter(col("op") =!= "D")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    base.join(effective.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(survivors)
      .orderBy(col("o_orderkey"))
  }

  /** SCD-2 MERGE apply — the type-2 counterpart of `etl_upsert_merge`'s
    * type-1 overwrite, and the WRITE half of `scd2_status_history` /
    * `join_scd2_pointintime` (which consume an already-built history):
    * apply a day's changeset to an effective-dated dimension by CLOSING
    * the current version (valid_to = effective date) and INSERTING the
    * new one, carrying everything else — the nightly dimension merge
    * every warehouse runs. Includes the classic trap done right: NO-OP
    * suppression (a change row whose value equals the current version
    * must NOT spawn a version; here half the changeset is engineered to
    * be no-ops) and late-registered brand-new members under a disjoint
    * key range. The changeset derives deterministically from the base so
    * the result is oracle-checkable.
    *
    * Scale: one key equi-join (base × changes) + a three-way union — no
    * windows, no driver state; at 100 TB this is a single shuffle on the
    * dimension key, and the three branches are disjoint row sets of the
    * same join output (the optimizer shares the scan). */
  /** Surrogate-key assignment — the warehouse primitive behind every
    * dimension load: business keys (here the order-date calendar) get
    * DENSE, STABLE integer surrogates (date_key = rank in date order),
    * and the fact table re-keys through the dimension instead of
    * carrying the business key. The window runs over the DISTINCT date
    * relation (an aggregate, |dates| ≈ the calendar — the module's
    * unpartitioned-window-over-aggregated-input rule), never the fact
    * table; the fact re-key is one broadcast equi-join. Output: the date
    * dimension decorated with fact counts and revenue — the load-audit
    * readout a dimension build emits. */
  def surrogateKeys(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
    val dim = o.select(col("o_orderdate").as("d")).distinct()
      .withColumn("date_key",
        row_number().over(Window.orderBy(col("d"))).cast("long"))
    o.join(broadcast(dim), col("o_orderdate") === col("d"))
      .groupBy(col("date_key"), col("d").as("order_date"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("date_key"))
  }

  def scd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val eff = lit("1998-06-01").cast("date")
    val c = Tables.customer(spark, dir)
    val base = c.select(col("c_custkey"), col("c_mktsegment").as("segment"),
      lit("1995-01-01").cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val changes = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 14 === 0, col("c_mktsegment")) // engineered no-op
          .otherwise(lit("MOVED")).as("new_segment"))
    val joined = base.join(changes, Seq("c_custkey"), "left")
    val realChange = col("new_segment").isNotNull && col("new_segment") =!= col("segment")
    val carried = joined.filter(!realChange)
      .select(col("c_custkey"), col("segment"), col("valid_from"), col("valid_to"))
    val closed = joined.filter(realChange)
      .select(col("c_custkey"), col("segment"), col("valid_from"), eff.as("valid_to"))
    val opened = joined.filter(realChange)
      .select(col("c_custkey"), col("new_segment").as("segment"),
        eff.as("valid_from"), lit(null).cast("date").as("valid_to"))
    val newMembers = c.filter(col("c_custkey") % 999 === 0)
      .select((col("c_custkey") + lit(1000000000L)).as("c_custkey"),
        lit("NEWSEG").as("segment"), eff.as("valid_from"),
        lit(null).cast("date").as("valid_to"))
    carried.unionByName(closed).unionByName(opened).unionByName(newMembers)
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Calendar arithmetic breadth (the X-series' date half): day diffs,
    * interval adds, month ends, and month truncation — each mirrored by
    * the DuckDB calendar functions over DATE values, so the whole
    * arithmetic (leap years, month-length variation) sits under the hash
    * gate as exact dates/ints. A fixed epoch anchor keeps datediff
    * deterministic. */
  def dateArithmetic(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .filter(col("o_orderkey") % 97 === 0) // review-sized deterministic slice
    o.select(col("o_orderkey"), col("d"),
        datediff(col("d"), lit("1992-01-01").cast("date")).cast("long").as("days_since_epoch"),
        date_add(col("d"), 30).as("due_date"),
        last_day(col("d")).as("month_end"),
        trunc(col("d"), "month").as("month_start"),
        (year(col("d")) * 4 + quarter(col("d"))).cast("long").as("quarter_idx"))
      .orderBy(col("o_orderkey"))
  }

  /** Per-bucket table checksum — how two copies of a 100 TB table are
    * reconciled WITHOUT moving data (cross-region replication audit,
    * post-migration validation, CDC drift detection): every row folds to
    * a 60-bit content digest, digests XOR per key bucket, and the two
    * sides compare |buckets| tiny rows; a mismatched bucket localizes the
    * drill-down to 1/|buckets| of the table. XOR is commutative and
    * associative, so the aggregate is partitioning/order-invariant and
    * map-side partials collapse it — one scan, no shuffle beyond the
    * 32-row rollup.
    *
    * Portability (hash gate): the digest is the first 15 hex chars of
    * md5 (60 bits — fits BIGINT exactly in both engines); doubles enter
    * the digest as DECIMAL(18,2) strings and timestamps via an explicit
    * format, because raw double/timestamp→string rendering is
    * engine-specific. */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val digest = conv(substring(md5(concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("string"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderpriority"))), 1, 15), 16, 10).cast("long")
    Tables.orders(spark, dir)
      .select((col("o_orderkey") % 32).as("bucket"), digest.as("d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(d)").as("xor_digest"))
      .orderBy(col("bucket"))
  }

  /** URL decomposition — the first projection over any web corpus
    * (per-domain mixture, path dedup, tracking-param scrubs all start
    * here): documents get deterministic synthetic URLs, `parse_url`
    * splits HOST / PATH / one QUERY key, and the report rolls up per
    * (host, lang). Pure codegen-adjacent projection + one hash-agg.
    * Oracle mirrors the split with anchored regexes (DuckDB has no URL
    * parser) — equal on well-formed URLs, which the builder guarantees. */
  def parseUrl(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
      col("doc_id"), lit("?lang="), col("lang"), lit("&len="), col("n_chars"))
    Tables.documents(spark, dir)
      .select(url.as("url"))
      .select(
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang"))
      .groupBy(col("host"), col("lang"))
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("path")).as("n_paths"))
      .orderBy(col("host"), col("lang"))
  }

  /** URL canonicalization + dedup — the crawl-frontier step BEFORE any
    * content dedup runs (the same page arrives as case-variant hosts,
    * utm-tagged links, trailing-slash and fragment variants; fetching
    * each wastes the crawler and poisons per-domain stats). Deterministic
    * messy variants are planted from doc_id arithmetic (case %3, slash
    * %5, utm %2, fragment %7 over a %400 page key), then canonicalized
    * relationally: host lowercased, path trailing-slash-stripped,
    * `utm_*` params dropped while REAL params (lang) survive, fragment
    * discarded — all with portable regex/array ops, no UDF. Report:
    * top-15 canonical URLs by variant count + the global collapse audit
    * (raw vs canonical counts, dedup ppm) on every row.
    *
    * Scale: one projection (regex + list ops, codegen-friendly) + one
    * canonical-key hash-agg + a 1-row broadcast; the frontier never
    * all-pairs — canonicalization IS the blocking key. */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val raw = expr(
      "concat('https://', " +
        "CASE WHEN doc_id % 3 = 0 THEN concat(upper(source), '.EXAMPLE.COM') " +
        "ELSE concat(source, '.example.com') END, " +
        "'/docs/', cast(doc_id % 400 as string), " +
        "CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END, " +
        "CASE WHEN doc_id % 2 = 0 THEN concat('?utm_source=feed&lang=', lang) " +
        "ELSE concat('?lang=', lang) END, " +
        "CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END)")
    val canon = expr(
      "concat('https://', " +
        "lower(regexp_extract(raw, '^https://([^/]+)', 1)), " +
        "regexp_replace(regexp_extract(raw, '^https://[^/]+([^?#]*)', 1), '/$', ''), " +
        "CASE WHEN array_join(filter(split(regexp_extract(raw, '\\\\?([^#]*)', 1), '&'), " +
        "p -> NOT startswith(p, 'utm_')), '&') <> '' " +
        "THEN concat('?', array_join(filter(split(regexp_extract(raw, '\\\\?([^#]*)', 1), '&'), " +
        "p -> NOT startswith(p, 'utm_')), '&')) ELSE '' END)")
    val canonized = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .withColumn("raw", raw)
      .withColumn("canonical", canon)
    val groups = canonized.groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_fetches"),
        countDistinct(col("raw")).as("n_variants"))
      .cache() // top-15 output + the 1-row collapse audit
    val tot = groups.agg(
      sum(col("n_fetches")).as("n_raw_total"),
      count(lit(1)).as("n_canonical_total"))
      .select(col("n_raw_total"), col("n_canonical_total"),
        expr("(n_raw_total - n_canonical_total) * 1000000 DIV n_raw_total")
          .as("dedup_ppm"))
    groups.crossJoin(broadcast(tot))
      .orderBy(desc("n_variants"), col("canonical"))
      .limit(15)
  }

  /** Winsorization — the robust-preprocessing clip every feature pipeline
    * runs before scaling (outliers squash a StandardScaler's variance):
    * values are clipped to the exact [p5, p95] band. The band is a 1-row
    * aggregate broadcast back over the fact scan (the A9 no-driver-scalar
    * pattern — no collect, no second pass), and the report carries raw vs
    * clipped sums + the clip count per priority. Cutoffs are round-6'd on
    * both sides (the `win_ntile_tiers` determinism rule: 2-decimal prices
    * can't sit within 1e-6 of a cutoff, so the comparison is engine-safe);
    * sums run in decimal(18,6) because clipped values inherit the
    * 6-decimal bound. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val o = Tables.orders(spark, dir)
    val band = o.agg(
      round(percentile(col("o_totalprice"), lit(0.05)), 6).as("lo"),
      round(percentile(col("o_totalprice"), lit(0.95)), 6).as("hi"))
    def d6sum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
    o.crossJoin(broadcast(band))
      .select(col("o_orderpriority"), col("o_totalprice").as("raw"),
        greatest(col("lo"), least(col("hi"), col("o_totalprice"))).as("clipped"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        d6sum(col("raw")).as("sum_raw"),
        d6sum(col("clipped")).as("sum_clipped"),
        count(when(col("clipped") =!= col("raw"), 1)).as("n_clipped"))
      .orderBy(col("o_orderpriority"))
  }

  /** ANSI-safe casting (`try_cast`) — the Spark 4 ingest-robustness
    * surface (SURVEY §7.6: ANSI mode is on by default in 4.x, so the
    * reference's permissive `.toDouble`-style casts need explicit
    * try_cast): a deterministically dirty string column (every 7th key
    * gets a trailing letter, every 11th an out-of-range month) is parsed
    * with try_cast to BIGINT and DATE — bad rows become NULL instead of
    * failing the job — and the report counts parse outcomes. DuckDB's
    * TRY_CAST has the same contract, so the whole null-on-bad-input
    * behavior sits under the hash gate. */
  def tryCasts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"))
      .withColumn("key_str",
        when(col("o_orderkey") % 7 === 0, concat(col("o_orderkey"), lit("x")))
          .otherwise(col("o_orderkey").cast("string")))
      .withColumn("date_str",
        when(col("o_orderkey") % 11 === 0, lit("1997-13-01"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
    o.select(
        expr("try_cast(key_str AS BIGINT)").as("k"),
        expr("try_cast(date_str AS DATE)").as("d"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("k")).as("n_key_ok"),
        count(col("d")).as("n_date_ok"),
        sum(col("k")).as("key_sum"),
        max(col("d")).as("max_date"))
  }

  /** Null-preserving generator (`explode_outer`) — the generator twin of
    * the X8 null-preservation stance: plain `explode` silently DROPS every
    * row whose array is empty, so "explode the matches" loses exactly the
    * documents that matched nothing — usually the rows a report must still
    * count. Each doc's matches of one vocabulary token become an array
    * (empty for most docs); explode_outer keeps matchless docs as one
    * NULL row, and the per-source rollup proves both populations survive
    * (n_docs equals the table's count, docless rows are the complement).
    * Oracle emulates outer-unnest with a UNION ALL of the two branches. */
  def explodeOuter(spark: SparkSession, dir: String): DataFrame = {
    val arr = filter(split(col("text"), " "), t => t === "vector")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode_outer(arr).as("tok"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("tok")).as("n_token_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(when(col("tok").isNull, 1)).as("n_docless_rows"))
      .orderBy(col("source"))
  }

  /** Data-quality expectation audit — the constraint gate every ingest
    * pipeline runs before publishing a batch (Deequ/expectations-style):
    * one row per rule with checked/violation counts and a pass flag.
    * Rules cover the four standard families: range (lineitem quantity /
    * discount), referential integrity (orders.custkey ⊆ customer),
    * uniqueness (customer key), and cross-field consistency (documents
    * n_chars vs text; events value non-null/finite).
    *
    * Scale shape: all same-table rules share ONE scan — conditional
    * `count(when)` partial aggs collapse each to a 1-row relation
    * map-side, and `stack` fans the 1-row aggregate into rule rows
    * (driver never sees a count). The FK rule is a broadcast left join
    * against the distinct dimension keys — the dimension is the small
    * side, so the 100 TB fact side streams. Total wire cost: a handful of
    * 1-row partials, regardless of input size. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val liRules = Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("qty_bad"),
        count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)).as("disc_bad"))
      .selectExpr(
        """stack(2,
          |  'lineitem_qty_range', n, qty_bad,
          |  'lineitem_discount_range', n, disc_bad)
          |AS (rule_name, n_checked, n_violations)""".stripMargin)
    val custKeys = Tables.customer(spark, dir).select(col("c_custkey")).distinct()
    val fkRule = Tables.orders(spark, dir)
      .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"), count(when(col("c_custkey").isNull, 1)).as("bad"))
      .select(lit("orders_fk_customer").as("rule_name"),
        col("n").as("n_checked"), col("bad").as("n_violations"))
    val uniqRule = Tables.customer(spark, dir)
      .agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("nd"))
      .select(lit("customer_key_unique").as("rule_name"),
        col("n").as("n_checked"), (col("n") - col("nd")).as("n_violations"))
    val docRule = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n"),
        count(when(col("n_chars") =!= length(col("text")), 1)).as("bad"))
      .select(lit("documents_chars_consistent").as("rule_name"),
        col("n").as("n_checked"), col("bad").as("n_violations"))
    val evRule = Tables.events(spark, dir)
      .agg(count(lit(1)).as("n"),
        count(when(col("value").isNull || isnan(col("value")), 1)).as("bad"))
      .select(lit("events_value_finite").as("rule_name"),
        col("n").as("n_checked"), col("bad").as("n_violations"))
    liRules.unionByName(fkRule).unionByName(uniqRule)
      .unionByName(docRule).unionByName(evRule)
      .withColumn("pass", col("n_violations") === 0)
      .orderBy(col("rule_name"))
  }

  /** Sequence-gap audit (ledger completeness): find the missing id runs in
    * the F-status order sequence — the voided-invoice / lost-batch check
    * every billing reconciliation runs. The DISTRIBUTED shape matters: a
    * naive `lead(k) OVER (ORDER BY k)` is a single-partition global sort,
    * so the scan is decomposed two-level — within-block gaps under a
    * window PARTITIONED by `k div 4096` (parallel, each partition a few
    * thousand keys), plus boundary gaps from the |blocks|-row (min, max)
    * aggregate under a tiny unpartitioned window (the windows-over-
    * aggregates pattern the catalog rule allows; |blocks| = |keys|/4096).
    * Union, top-20 largest runs with a (len, start) total order. */
  def sequenceGaps(spark: SparkSession, dir: String): DataFrame = {
    val k = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("k")).distinct()
      .withColumn("blk", expr("k div 4096"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("k"))
    val within = k.withColumn("nxt", lead(col("k"), 1).over(wIn))
      .filter(col("nxt") - col("k") > 1)
      .select((col("k") + 1).as("gap_start"), (col("nxt") - 1).as("gap_end"))
    val blocks = k.groupBy(col("blk"))
      .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    val wB = Window.orderBy(col("blk"))
    val boundary = blocks.withColumn("next_min", lead(col("min_k"), 1).over(wB))
      .filter(col("next_min") - col("max_k") > 1)
      .select((col("max_k") + 1).as("gap_start"), (col("next_min") - 1).as("gap_end"))
    within.unionByName(boundary)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("gap_len"))
      .orderBy(col("gap_len").desc, col("gap_start")).limit(20)
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et al.
    * 2007) — the re-identification gate a dataset passes before release:
    * every quasi-identifier combination (here nation × market segment)
    * must cover ≥ k individuals, and its sensitive attribute (account
    * balance, banded to 2000-unit buckets) must take ≥ l distinct values
    * so the group doesn't leak the attribute by uniformity. Emits the
    * per-group audit (size, diversity, both flags) — the relation a
    * release pipeline joins against to suppress or generalize failing
    * groups.
    *
    * Scale: one hash-agg over the quasi-identifier key (count +
    * count-distinct of the banded sensitive value — the distinct runs
    * under the same shuffle, partial-aggregated map-side); output is
    * |QI-combinations| rows, constant-bounded by the key domain. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val K = 8L
    val L = 3L
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long").as("sens_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("sens_band")).as("l_diversity"))
      .withColumn("k_ok", col("n_members") >= K)
      .withColumn("l_ok", col("l_diversity") >= L)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Referential-integrity audit — the warehouse ingest gate `etl_dq_audit`
    * (row-level rules) doesn't cover: for every foreign-key edge of the
    * star schema, how many child rows point at a missing parent. Each
    * edge is one LEFT ANTI join (never materializes parent payload) +
    * a count, and the per-edge 1-row results union into a fixed-height
    * audit relation with orphan rate in ppm (integer DIV, child count
    * guarded — an empty child table yields rate NULL, mirrored).
    *
    * Scale: anti joins shuffle on the key (or broadcast the dim side
    * when AQE sizes it small); counts collapse map-side. The audit is
    * 4 rows regardless of data size. */
  def fkOrphans(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame = {
      val orph = child.select(col(ck))
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val tot = child.agg(count(lit(1)).as("n_child"))
      orph.crossJoin(broadcast(tot))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
          when(col("n_child") > 0L,
            expr("n_orphans * 1000000 DIV n_child")).as("orphan_ppm"))
    }
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    Seq(
      edge("orders.custkey->customer", o, "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      edge("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
      edge("lineitem.partkey->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      edge("lineitem.suppkey->supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .reduce(_.unionAll(_))
      .orderBy(col("fk_edge"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_fk_orphans" -> (fkOrphans _),
    "etl_k_anonymity" -> (kAnonymity _),
    "etl_sequence_gaps" -> (sequenceGaps _),
    "etl_dq_audit" -> (dqAudit _),
    "etl_explode_outer" -> (explodeOuter _),
    "etl_try_cast" -> (tryCasts _),
    "etl_winsorize" -> (winsorize _),
    "etl_parse_url" -> (parseUrl _),
    "etl_url_canonical" -> (urlCanonical _),
    "etl_table_checksum" -> (tableChecksum _),
    "etl_date_arithmetic" -> (dateArithmetic _),
    "etl_array_hof"      -> (arrayHof _),
    "etl_upsert_merge"   -> (upsertMerge _),
    "etl_cdc_apply"      -> (cdcApply _),
    "etl_scd2_merge"     -> (scd2Merge _),
    "etl_surrogate_keys" -> (surrogateKeys _),
    "etl_dedup_first_order" -> (dedupFirstOrder _),
    "etl_dedup_dropdup"     -> (dedupDropDuplicates _),
    "etl_validity_filter"   -> (validityFilter _),
    "etl_null_handling"     -> (nullHandling _),
    "etl_case_when"         -> (caseWhenBuckets _),
    "etl_datetime_parts"    -> (datetimeParts _),
    "etl_string_funcs"      -> (stringFuncs _),
    "etl_prefix_decode"     -> (prefixDecode _),
    "etl_decode_dim"        -> (decodeDim _),
    "etl_json_extract"      -> (jsonExtract _),
    "etl_variant_extract"   -> (variantExtract _),
    "etl_map_funcs"         -> (mapFuncs _)
  )

  val oracle: Map[String, String] = Map(
    // correlated NOT EXISTS, not NOT IN: NOT IN is three-valued under a
    // NULL parent key (yields zero rows, undercounting orphans to 0)
    // while the Spark side's left_anti counts them — NOT EXISTS matches
    // anti-join semantics regardless of NULL keys
    "etl_fk_orphans" ->
      """WITH e1 AS (
        |  SELECT 'orders.custkey->customer' AS fk_edge,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey))
        |      AS n_orphans),
        |e2 AS (
        |  SELECT 'lineitem.orderkey->orders' AS fk_edge,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |      AS n_orphans),
        |e3 AS (
        |  SELECT 'lineitem.partkey->part' AS fk_edge,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM part p
        |                       WHERE p.p_partkey = l.l_partkey))
        |      AS n_orphans),
        |e4 AS (
        |  SELECT 'lineitem.suppkey->supplier' AS fk_edge,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                       WHERE s.s_suppkey = l.l_suppkey))
        |      AS n_orphans),
        |u AS (
        |  SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
        |SELECT fk_edge, n_child, n_orphans,
        |  CASE WHEN n_child > 0 THEN n_orphans * 1000000 // n_child
        |  END AS orphan_ppm
        |FROM u ORDER BY fk_edge""".stripMargin,
    "etl_surrogate_keys" ->
      """WITH dim AS (
        |  SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS date_key
        |  FROM (SELECT DISTINCT o_orderdate AS d FROM orders))
        |SELECT date_key, d AS order_date,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN dim ON o_orderdate = d
        |GROUP BY date_key, d
        |ORDER BY date_key""".stripMargin,
    "etl_scd2_merge" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
        |  FROM customer),
        |changes AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 14 = 0 THEN c_mktsegment ELSE 'MOVED' END AS new_segment
        |  FROM customer WHERE c_custkey % 7 = 0),
        |j AS (
        |  SELECT base.*, changes.new_segment,
        |    changes.new_segment IS NOT NULL AND changes.new_segment <> base.segment AS chg
        |  FROM base LEFT JOIN changes USING (c_custkey)),
        |carried AS (
        |  SELECT c_custkey, segment, valid_from, valid_to FROM j WHERE NOT chg OR chg IS NULL),
        |closed AS (
        |  SELECT c_custkey, segment, valid_from, DATE '1998-06-01' AS valid_to FROM j WHERE chg),
        |opened AS (
        |  SELECT c_custkey, new_segment AS segment, DATE '1998-06-01' AS valid_from,
        |    CAST(NULL AS DATE) AS valid_to FROM j WHERE chg),
        |newm AS (
        |  SELECT c_custkey + 1000000000 AS c_custkey, 'NEWSEG' AS segment,
        |    DATE '1998-06-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
        |  FROM customer WHERE c_custkey % 999 = 0)
        |SELECT * FROM (
        |  SELECT * FROM carried UNION ALL SELECT * FROM closed
        |  UNION ALL SELECT * FROM opened UNION ALL SELECT * FROM newm)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "etl_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  COUNT(*) AS n_members,
        |  COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) AS l_diversity,
        |  COUNT(*) >= 8 AS k_ok,
        |  COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) >= 3 AS l_ok
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "etl_sequence_gaps" ->
      """WITH k AS (
        |  SELECT DISTINCT o_orderkey AS k, o_orderkey // 4096 AS blk
        |  FROM orders WHERE o_orderstatus = 'F'),
        |w AS (
        |  SELECT k, blk, LEAD(k) OVER (PARTITION BY blk ORDER BY k) AS nxt FROM k),
        |within AS (
        |  SELECT k + 1 AS gap_start, nxt - 1 AS gap_end FROM w WHERE nxt - k > 1),
        |blocks AS (
        |  SELECT blk, MIN(k) AS min_k, MAX(k) AS max_k FROM k GROUP BY blk),
        |b AS (
        |  SELECT max_k, LEAD(min_k) OVER (ORDER BY blk) AS next_min FROM blocks),
        |boundary AS (
        |  SELECT max_k + 1 AS gap_start, next_min - 1 AS gap_end
        |  FROM b WHERE next_min - max_k > 1),
        |u AS (
        |  SELECT * FROM within UNION ALL SELECT * FROM boundary)
        |SELECT gap_start, gap_end, gap_end - gap_start + 1 AS gap_len
        |FROM u
        |ORDER BY gap_len DESC, gap_start
        |LIMIT 20""".stripMargin,
    "etl_dq_audit" ->
      """WITH li AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS qty_bad,
        |    COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS disc_bad
        |  FROM lineitem),
        |fk AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS bad
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey),
        |cu AS (SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS nd FROM customer),
        |dc AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(CASE WHEN n_chars <> length(text) THEN 1 END) AS bad
        |  FROM documents),
        |ev AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(CASE WHEN value IS NULL OR isnan(value) THEN 1 END) AS bad
        |  FROM events),
        |u AS (
        |  SELECT 'lineitem_qty_range' AS rule_name, n AS n_checked,
        |    qty_bad AS n_violations FROM li
        |  UNION ALL SELECT 'lineitem_discount_range', n, disc_bad FROM li
        |  UNION ALL SELECT 'orders_fk_customer', n, bad FROM fk
        |  UNION ALL SELECT 'customer_key_unique', n, n - nd FROM cu
        |  UNION ALL SELECT 'documents_chars_consistent', n, bad FROM dc
        |  UNION ALL SELECT 'events_value_finite', n, bad FROM ev)
        |SELECT rule_name, n_checked, n_violations, n_violations = 0 AS pass
        |FROM u ORDER BY rule_name""".stripMargin,
    "etl_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x = 'vector') AS arr
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, unnest(arr) AS tok
        |  FROM t WHERE len(arr) > 0
        |  UNION ALL
        |  SELECT doc_id, source, NULL AS tok
        |  FROM t WHERE len(arr) = 0)
        |SELECT source,
        |  COUNT(*) AS n_rows,
        |  COUNT(tok) AS n_token_rows,
        |  COUNT(DISTINCT doc_id) AS n_docs,
        |  COUNT(CASE WHEN tok IS NULL THEN 1 END) AS n_docless_rows
        |FROM r GROUP BY source
        |ORDER BY source""".stripMargin,
    "etl_try_cast" ->
      """WITH s AS (
        |  SELECT
        |    CASE WHEN o_orderkey % 7 = 0
        |      THEN o_orderkey || 'x' ELSE CAST(o_orderkey AS VARCHAR) END AS key_str,
        |    CASE WHEN o_orderkey % 11 = 0
        |      THEN '1997-13-01' ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str
        |  FROM orders),
        |p AS (
        |  SELECT TRY_CAST(key_str AS BIGINT) AS k,
        |    TRY_CAST(date_str AS DATE) AS d
        |  FROM s)
        |SELECT COUNT(*) AS n_rows,
        |  COUNT(k) AS n_key_ok,
        |  COUNT(d) AS n_date_ok,
        |  CAST(SUM(k) AS BIGINT) AS key_sum,
        |  MAX(d) AS max_date
        |FROM p""".stripMargin,
    "etl_winsorize" ->
      """WITH band AS (
        |  SELECT ROUND(quantile_cont(o_totalprice, 0.05), 6) AS lo,
        |    ROUND(quantile_cont(o_totalprice, 0.95), 6) AS hi
        |  FROM orders),
        |c AS (
        |  SELECT o_orderpriority, o_totalprice AS raw,
        |    GREATEST(lo, LEAST(hi, o_totalprice)) AS clipped
        |  FROM orders, band)
        |SELECT o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(raw AS DECIMAL(18,6))) AS DOUBLE) AS sum_raw,
        |  CAST(SUM(CAST(clipped AS DECIMAL(18,6))) AS DOUBLE) AS sum_clipped,
        |  COUNT(CASE WHEN clipped <> raw THEN 1 END) AS n_clipped
        |FROM c GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "etl_url_canonical" ->
      """WITH r AS (
        |  SELECT 'https://' ||
        |    CASE WHEN doc_id % 3 = 0 THEN upper(source) || '.EXAMPLE.COM'
        |      ELSE source || '.example.com' END ||
        |    '/docs/' || CAST(doc_id % 400 AS VARCHAR) ||
        |    CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&lang=' || lang
        |      ELSE '?lang=' || lang END ||
        |    CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END AS raw
        |  FROM documents),
        |c AS (
        |  SELECT raw, 'https://' ||
        |    lower(regexp_extract(raw, '^https://([^/]+)', 1)) ||
        |    regexp_replace(regexp_extract(raw, '^https://[^/]+([^?#]*)', 1),
        |      '/$', '') ||
        |    CASE WHEN array_to_string(list_filter(
        |        string_split(regexp_extract(raw, '\?([^#]*)', 1), '&'),
        |        p -> NOT starts_with(p, 'utm_')), '&') <> ''
        |      THEN '?' || array_to_string(list_filter(
        |        string_split(regexp_extract(raw, '\?([^#]*)', 1), '&'),
        |        p -> NOT starts_with(p, 'utm_')), '&')
        |      ELSE '' END AS canonical
        |  FROM r),
        |g AS (
        |  SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_fetches,
        |    CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_variants
        |  FROM c GROUP BY canonical),
        |tot AS (
        |  SELECT CAST(SUM(n_fetches) AS BIGINT) AS n_raw_total,
        |    CAST(COUNT(*) AS BIGINT) AS n_canonical_total
        |  FROM g)
        |SELECT g.canonical, g.n_fetches, g.n_variants,
        |  t.n_raw_total, t.n_canonical_total,
        |  CAST((t.n_raw_total - t.n_canonical_total) * 1000000 // t.n_raw_total
        |    AS BIGINT) AS dedup_ppm
        |FROM g CROSS JOIN tot t
        |ORDER BY n_variants DESC, canonical LIMIT 15""".stripMargin,
    "etl_parse_url" ->
      """WITH u AS (
        |  SELECT 'https://' || source || '.example.com/docs/' || doc_id
        |    || '?lang=' || lang || '&len=' || n_chars AS url
        |  FROM documents),
        |p AS (
        |  SELECT
        |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |    regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |    regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang
        |  FROM u)
        |SELECT host, lang, COUNT(*) AS n_urls,
        |  COUNT(DISTINCT path) AS n_paths
        |FROM p GROUP BY host, lang
        |ORDER BY host, lang""".stripMargin,
    "etl_table_checksum" ->
      """WITH d AS (
        |  SELECT o_orderkey % 32 AS bucket,
        |    CAST(('0x' || substr(md5(concat_ws('|',
        |      o_orderkey, o_custkey, o_orderstatus,
        |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |      strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
        |      o_orderpriority)), 1, 15)) AS BIGINT) AS dg
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n_rows, bit_xor(dg) AS xor_digest
        |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin,
    "etl_date_arithmetic" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        |  year(CAST(o_orderdate AS DATE)) * 4 + quarter(CAST(o_orderdate AS DATE)) AS quarter_idx
        |FROM orders
        |WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "etl_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |log AS (
        |  SELECT o_orderkey, 1 AS lsn, 'U' AS op, o_custkey,
        |    'C' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', o_custkey, 'C', o_totalprice + 2.0
        |  FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', o_custkey, 'C', o_totalprice
        |  FROM base WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 1, 'U', o_custkey, 'C', o_totalprice + 5.0
        |  FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 1, 'U', o_custkey, 'C', o_totalprice + 5.0
        |  FROM base WHERE o_orderkey % 13 = 0),
        |eff AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |      ORDER BY lsn DESC, op, o_totalprice) AS rn
        |    FROM log)
        |  WHERE rn = 1)
        |SELECT * FROM (
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM eff e
        |                    WHERE e.o_orderkey = b.o_orderkey)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM eff WHERE op <> 'D')
        |ORDER BY o_orderkey""".stripMargin,
    "etl_upsert_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |updates AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0),
        |inserts AS (
        |  SELECT o_orderkey + 5000000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |changes AS (
        |  SELECT * FROM updates UNION ALL SELECT * FROM inserts)
        |SELECT * FROM (
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM changes c
        |                    WHERE c.o_orderkey = b.o_orderkey)
        |  UNION ALL
        |  SELECT * FROM changes)
        |ORDER BY o_orderkey""".stripMargin,
    "etl_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0.0)) AS BIGINT) AS n_pos,
        |  len(list_filter(embedding::DOUBLE[], x -> abs(x) > 2.0)) > 0 AS any_big,
        |  list_reduce(list_prepend(0.0::DOUBLE, embedding::DOUBLE[]),
        |    (x, y) -> x + y) AS sum_all,
        |  list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(list_zip(embedding::DOUBLE[], embedding::DOUBLE[]),
        |        z -> z[1] * z[2])),
        |    (x, y) -> x + y) AS sum_sq,
        |  list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(embedding::DOUBLE[],
        |        x -> CASE WHEN x > 1.0 THEN 1.0 WHEN x < -1.0 THEN -1.0 ELSE x END)),
        |    (x, y) -> x + y) AS clip_sum
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "etl_dedup_first_order" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        |FROM (SELECT *, ROW_NUMBER() OVER (
        |        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "etl_dedup_dropdup" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_rows,
        |  COUNT(DISTINCT o_custkey) AS n_keys,
        |  MIN(o_custkey) AS min_key,
        |  MAX(o_custkey) AS max_key
        |FROM orders""".stripMargin,
    "etl_validity_filter" ->
      """WITH li AS (
        |  SELECT *, NULLIF(l_tax, 0.0) AS tax_n, NULLIF(l_discount, 0.0) AS disc_n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  COUNT(*) AS n_rows,
        |  COUNT(tax_n) AS n_tax_present,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM li
        |WHERE (tax_n IS NULL OR (tax_n > 0.0 AND tax_n <= 0.06))
        |  AND (disc_n IS NULL OR disc_n <= 0.08)
        |  AND l_quantity > 0.0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "etl_null_handling" ->
      """WITH e AS (
        |  SELECT event_type,
        |    COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 0.0) AS value_filled
        |  FROM events),
        |f AS (
        |  SELECT event_type, value_filled,
        |    COALESCE(NULLIF(value_filled, 0.0), -1.0) AS value_coalesced,
        |    CASE WHEN value_filled > 100.0 THEN 1
        |         WHEN value_filled > 0.0 THEN 0
        |         ELSE NULL END AS is_big
        |  FROM e)
        |SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value_filled AS DECIMAL(18,2))) AS DOUBLE) AS sum_filled,
        |  COUNT(is_big) AS n_flagged,
        |  CAST(SUM(is_big) AS BIGINT) AS n_big
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    "etl_case_when" ->
      """SELECT
        |  CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 'critical'
        |    WHEN '2-HIGH' THEN 'elevated'
        |    WHEN '3-MEDIUM' THEN 'normal'
        |    WHEN '4-NOT SPECIFIED' THEN 'unspecified'
        |    WHEN '5-LOW' THEN 'relaxed'
        |    ELSE 'unknown' END AS priority_class,
        |  CASE WHEN o_totalprice < 100.0 THEN 'xs'
        |       WHEN o_totalprice < 1000.0 THEN 's'
        |       WHEN o_totalprice < 5000.0 THEN 'm'
        |       WHEN o_totalprice < 20000.0 THEN 'l'
        |       ELSE 'xl' END AS price_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "etl_datetime_parts" ->
      """WITH o AS (
        |  SELECT year(o_orderdate) AS order_year,
        |    month(o_orderdate) AS order_month,
        |    dayofweek(o_orderdate) + 1 AS order_dow,
        |    epoch_ms(o_orderdate) AS ems,
        |    month(epoch_ms(epoch_ms(o_orderdate))) AS rt_month
        |  FROM orders)
        |SELECT order_year, order_month, order_dow,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN rt_month = order_month THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
        |FROM o
        |GROUP BY order_year, order_month, order_dow
        |ORDER BY order_year, order_month, order_dow""".stripMargin,
    "etl_string_funcs" ->
      """WITH p AS (
        |  SELECT string_split(p_type, ' ') AS type_tokens,
        |    string_split(p_type, ' ')[-1] AS type_last,
        |    len(string_split(p_type, ' ')) AS n_tokens,
        |    length(p_name) AS name_len,
        |    regexp_replace(p_name, '[aeiou]', '', 'g') AS name_squashed,
        |    string_split(p_name, ' ')[-2] AS name_neg2
        |  FROM part)
        |SELECT type_last,
        |  COUNT(*) AS n_parts,
        |  MAX(n_tokens) AS max_tokens,
        |  CAST(SUM(CAST(name_len AS DECIMAL(18,2))) AS DOUBLE) / COUNT(name_len) AS avg_name_len,
        |  MIN(name_squashed) AS min_squashed,
        |  MIN(name_neg2) AS min_neg2
        |FROM p GROUP BY type_last ORDER BY type_last""".stripMargin,
    "etl_decode_dim" ->
      """WITH dim(o_orderpriority, priority_class) AS (VALUES
        |  ('1-URGENT', 'critical'), ('2-HIGH', 'elevated'), ('3-MEDIUM', 'normal'),
        |  ('4-NOT SPECIFIED', 'unspecified'), ('5-LOW', 'relaxed'))
        |SELECT COALESCE(priority_class, 'unknown') AS priority_class,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
        |FROM orders LEFT JOIN dim USING (o_orderpriority)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "etl_prefix_decode" ->
      """SELECT
        |  CASE WHEN p_name LIKE 'small%' OR p_name LIKE 'large%' THEN 'size'
        |       WHEN p_name LIKE 'hot%'   OR p_name LIKE 'cold%'  THEN 'temp'
        |       WHEN p_name LIKE 'red%'   OR p_name LIKE 'blue%'  THEN 'color'
        |       WHEN p_name LIKE 'old%'   OR p_name LIKE 'new%'   THEN 'age'
        |       ELSE 'other' END AS name_class,
        |  COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(p_retailprice) AS avg_price,
        |  MIN(p_name) AS first_name
        |FROM part
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "etl_json_extract" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(*) AS n_paths_agree
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "etl_map_funcs" ->
      """SELECT o_orderstatus AS status_v,
        |  o_orderpriority AS prio_v,
        |  COUNT(*) AS n_orders,
        |  CAST(2 AS BIGINT) AS max_keys
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "etl_variant_extract" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
