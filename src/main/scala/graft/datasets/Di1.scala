package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.curve.Curve
import graft.functions._
import graft.ops.AsOf

/** DI1 curve analytics (D23; reference /root/reference/pyield/futuro/di1.py).
  * Input is any enriched DI1 frame (Futuro.enriquecer output); the reference
  * pulls the same shape from its cached PR dataset.
  */
object Di1 {

  /** `dados`: optional month-start maturity truncation and restriction of
    * contracts to known prefix-bond maturities (filtrar_pre — an as-of map
    * of each reference date to the nearest prior TPF date, then an inner
    * join on the maturity; di1.py:89-117).
    */
  def dados(enriched: DataFrame, inicioMes: Boolean = false,
            tpfVencimentos: Option[DataFrame] = None): DataFrame = {
    var df = enriched
    tpfVencimentos.foreach { tpf =>
      val tpfPrep = tpf.select(
        col("data_referencia").as("data_ref_tpf"),
        bday_add(col("data_vencimento"), lit(0)).as("data_vencimento"))
      val refDates = tpfPrep.select(col("data_ref_tpf")).distinct()
      // broadcast form: refDates is a distinct-date list (tiny), and the
      // windowed as-of with no `by` group would funnel the whole DI1
      // history through one window partition
      df = AsOf.joinBroadcast(df, refDates,
        leftOn = "data_referencia", rightOn = "data_ref_tpf",
        payload = Seq("data_ref_tpf" -> "data_ref_tpf"))
      df = df.join(tpfPrep, Seq("data_ref_tpf", "data_vencimento"), "left_semi")
        .drop("data_ref_tpf")
    }
    if (inicioMes)
      df = df.withColumn("data_vencimento", trunc(col("data_vencimento"), "mon"))
    df.orderBy(col("data_referencia"), col("data_vencimento"))
  }

  /** Vectorized multi-curve flat-forward interpolation of DI rates for
    * (reference date, maturity) target pairs (di1.py:144-248). Business-day
    * distances are computed per row; the curve is the enriched DI1 history.
    */
  def interpolarTaxas(enriched: DataFrame, targets: DataFrame,
                      extrapolar: Boolean = true,
                      tipoTaxa: String = "taxa_ajuste",
                      outCol: String = "taxa_interpolada"): DataFrame = {
    val curve = enriched.select(
      col("data_referencia").as("_c_ref"),
      col("dias_uteis").as("_c_du"),
      col(tipoTaxa).as("_c_tx"))
    val t = targets.withColumn("_du_alvo",
      bday_count(col("data_referencia"), col("data_vencimento")))
    Curve.interpolate(t, "_du_alvo", curve, "_c_du", "_c_tx",
        groupT = Seq("data_referencia"), groupC = Seq("_c_ref"),
        extrapolate = extrapolar, outCol = outCol)
      .drop("_du_alvo")
  }

  /** Scalar convenience: one (reference date, maturity) pair. */
  def interpolarTaxa(spark: SparkSession, enriched: DataFrame,
                     dataReferencia: String, dataVencimento: String,
                     extrapolar: Boolean = false): Double = {
    import spark.implicits._
    val targets = Seq((dataReferencia, dataVencimento))
      .toDF("data_referencia", "data_vencimento")
      .select(to_date(col("data_referencia")).as("data_referencia"),
        to_date(col("data_vencimento")).as("data_vencimento"))
    val rows = interpolarTaxas(enriched, targets, extrapolar).collect()
    if (rows.isEmpty || rows.head.isNullAt(rows.head.length - 1)) Double.NaN
    else rows.head.getDouble(rows.head.length - 1)
  }
}
