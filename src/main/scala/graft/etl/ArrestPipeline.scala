package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Transforms => T, Warehouse => W}

/** The reference ETL pipeline (emmanuel24699/nypd-arrest-etl) re-expressed
  * as three composable `DataFrame => DataFrame` stages. Semantics follow
  * SURVEY.md §1.4/§3.1: operator order is preserved where it is
  * load-bearing; the §1.5 quirks are implemented *fixed* (documented per
  * step). The "warehouse" is a parquet directory; upsert is first-writer-
  * wins via anti-join (scripts/load.py:114-147).
  */
object ArrestPipeline {

  /** Warehouse schema — DDL at reference scripts/setup_db.py:33-54. */
  val ArrestSchema: StructType = StructType(Seq(
    StructField("arrest_key", StringType, nullable = false),
    StructField("arrest_date", DateType, nullable = false),
    StructField("pd_cd", StringType),
    StructField("pd_desc", StringType),
    StructField("ky_cd", StringType),
    StructField("ofns_desc", StringType),
    StructField("law_code", StringType),
    StructField("law_cat_cd", StringType),
    StructField("arrest_boro", StringType),
    StructField("arrest_precinct", IntegerType),
    StructField("jurisdiction_code", StringType),
    StructField("age_group", StringType),
    StructField("perp_sex", StringType),
    StructField("perp_race", StringType),
    StructField("x_coord_cd", StringType),
    StructField("y_coord_cd", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  val StringCols: Seq[String] = Seq("pd_cd", "pd_desc", "ky_cd", "ofns_desc",
    "law_code", "arrest_boro", "jurisdiction_code", "age_group", "perp_sex",
    "perp_race", "x_coord_cd", "y_coord_cd")

  val UpperCols: Seq[String] = Seq("pd_desc", "ofns_desc", "law_code",
    "age_group", "perp_race")

  /** Stage 2 — transform (scripts/transform.py:48-176, operator order from
    * SURVEY §3.1). Input: raw Socrata/CSV-shaped frame (all strings or
    * inferred); output: the 18-column cleaned frame.
    */
  def transform(raw: DataFrame): DataFrame = {
    // P1 rename: upper-case headers → lower (transform.py:68-73)
    var df = T.normalizeColumnCase(raw)
    // P5 required-column validation (extract.py:118-122)
    df = T.requireColumns(df, Seq("arrest_key", "arrest_date"))
    // P2 add missing expected columns (transform.py:74-76)
    df = (StringCols ++ Seq("law_cat_cd", "arrest_precinct", "latitude", "longitude"))
      .foldLeft(df)((d, c) => T.addMissingColumn(d, c, lit(null: String)))
    // P3 drop the nested geo struct (transform.py:94-97)
    df = T.dropIfPresent(df, "lon_lat")
    // F1+F2 key filters (transform.py:101-103)
    df = T.filterNonBlank(
      T.dropNullKeys(df, Seq("arrest_key", "arrest_date")),
      Seq("arrest_key", "arrest_date"))
    // E4+E5 lenient date parse with epoch-millis fallback
    // (transform.py:38-46, :109-115); §1.5 fix: drop rows whose date is
    // STILL unparseable (reference would violate its NOT NULL at load).
    df = df.withColumn("arrest_date",
        T.dateOrEpochMillis(col("arrest_date").cast("string")))
      .filter(col("arrest_date").isNotNull)
    // E1 stringify + ''-for-missing → net-NULL warehouse semantics (§1.4):
    // we keep NULL (the reference's empty strings become NULL at COPY).
    df = StringCols.foldLeft(df)((d, c) =>
      d.withColumn(c, nullif(trim(coalesce(col(c).cast("string"), lit(""))), lit(""))))
    // E2 law-cat domain guard (transform.py:27-35 + load.py:128-131)
    df = df.withColumn("law_cat_cd", T.lawCategoryGuard(col("law_cat_cd")))
    // E12 sex domain guard (load.py:136-139)
    df = df.withColumn("perp_sex", T.sexGuard(col("perp_sex")))
    // E7/E8 lenient numeric casts; §1.5 fix: "83.0" → 83 int
    df = df.withColumn("arrest_precinct", T.lenientInt(col("arrest_precinct")))
      .withColumn("latitude", T.lenientDouble(col("latitude")))
      .withColumn("longitude", T.lenientDouble(col("longitude")))
    // E9 sentinel fills (transform.py:137, :144-145)
    df = T.fillSentinels(df, Map("arrest_precinct" -> -1),
      Map("latitude" -> 0.0, "longitude" -> 0.0))
    // E3 borough map with passthrough (transform.py:148-150)
    df = df.withColumn("arrest_boro",
      T.mapWithPassthrough(upper(col("arrest_boro")), T.BoroughMap))
    // E10 uppercase normalization (transform.py:152-159)
    df = T.upperCols(df, UpperCols)
    // P4 project to the exact load schema (load.py:182-192)
    df.select(ArrestSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Stage 3 — load: first-writer-wins upsert into a parquet warehouse
    * (scripts/load.py:107-159). Returns inserted-row count; idempotent.
    */
  def load(cleaned: DataFrame, warehouseDir: String): Long =
    W.upsertIntoParquet(cleaned, warehouseDir,
      keys = Seq("arrest_key"),
      tiebreak = ArrestSchema.fieldNames.filterNot(_ == "arrest_key").map(col).toIndexedSeq)

  /** Incremental extract filter (extract.py:63 + :103): rows after the
    * warehouse high-water-mark. §1.5 watermark quirk fixed by `>=` + the
    * PK-dedup in [[load]].
    */
  def incrementalSource(source: DataFrame, warehouse: DataFrame): DataFrame = {
    val hwm = warehouse.agg(
      coalesce(max(col("arrest_date")), lit("1900-01-01").cast("date")).as("__hwm"))
    source.join(broadcast(hwm), col("arrest_date") >= col("__hwm")).drop("__hwm")
  }
}
