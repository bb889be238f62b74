package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bonds.BondColumns
import graft.curve.Curve
import graft.functions._

/** Composed TPF datasets — the Spark form of the reference's public
  * `tpf`/`ntnb` entry points (EP2 in SURVEY §3; reference
  * pyield/tpf/titulos/ntnb.py:26-114, tpf/titulos/_utils.py:51-123).
  */
object Tpf {

  /** Attach the flat-forward-interpolated DI rate for each bond maturity
    * (`adicionar_taxa_di`): business days from the reference date feed the
    * single-curve interpolation of the enriched DI1 frame.
    */
  def adicionarTaxaDi(tpf: DataFrame, di1Enriched: DataFrame,
                      extrapolar: Boolean = true): DataFrame = {
    val curve = di1Enriched.select(
      col("dias_uteis").as("_c_du"), col("taxa_ajuste").as("_c_tx"))
    val targets = tpf.withColumn("_du_alvo",
      bday_count(col("data_referencia"), col("data_vencimento")))
    Curve.interpolate(targets, "_du_alvo", curve, "_c_du", "_c_tx",
        extrapolate = extrapolar, outCol = "taxa_di")
      .drop("_du_alvo")
  }

  /** premios_pre: spread of the prefixed families over DI
    * (premio = taxa_indicativa - taxa_di; _utils.py:51-123).
    */
  def premiosPre(tpfPre: DataFrame, di1Enriched: DataFrame,
                 pontosBase: Boolean = false): DataFrame = {
    val base = adicionarTaxaDi(
      tpfPre.select(col("titulo"), col("data_referencia"),
        col("data_vencimento"), col("taxa_indicativa")),
      di1Enriched)
      .withColumn("premio", col("taxa_indicativa") - col("taxa_di"))
      .select(col("titulo"), col("data_vencimento"),
        (if (pontosBase) col("premio") * 10000 else col("premio")).as("premio"))
      .orderBy(col("titulo"), col("data_vencimento"))
    base
  }

  /** `ntnb.dados`-shaped composition (EP2): indicative rates + business
    * days + per-row duration and DV01 + interpolated DI + raw premium.
    * The zero-curve/BEI legs live in `bonds.Analytics.implicitas` (driver
    * scalar path, as in the reference).
    */
  def ntnbDados(tpfNtnb: DataFrame, di1Enriched: DataFrame): DataFrame = {
    val enriched = tpfNtnb
      .withColumn("dias_uteis",
        bday_count(col("data_referencia"), col("data_vencimento")))
      .withColumn("duration",
        BondColumns.ntnb_duration(col("data_referencia"),
          col("data_vencimento"), col("taxa_indicativa")))
      .withColumn("dv01",
        BondColumns.ntnb_dv01(col("data_referencia"), col("data_vencimento"),
          col("taxa_indicativa"), col("pu")))
    adicionarTaxaDi(enriched, di1Enriched)
      .withColumn("premio", col("taxa_indicativa") - col("taxa_di"))
      .orderBy(col("data_referencia"), col("data_vencimento"))
  }
}
