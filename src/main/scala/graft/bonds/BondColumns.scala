package graft.bonds

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Row-wise Column wrappers over the scalar STN pricing operators — the
  * Spark analogue of the reference's `pl.struct(...).map_elements` row UDFs
  * (/root/reference/pyield/tpf/titulos/_utils.py:168-186, ntnb.py:750-857).
  * Pricing needs the per-row cash-flow schedule, so a scalar UDF is the
  * right tool here (per SURVEY §2.9); the relational fast paths elsewhere
  * stay UDF-free.
  */
object BondColumns {

  private def nanToNull(v: Double): Option[Double] =
    if (v.isNaN) None else Some(v)

  private val ltnPuUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(Ltn.pu(liq, venc, taxa)))
  private val ltnTaxaUdf = udf((liq: LocalDate, venc: LocalDate, pu: Double) =>
    nanToNull(Ltn.taxa(liq, venc, pu)))
  private val ltnDv01Udf = udf(
    (liq: LocalDate, venc: LocalDate, taxa: Double, pu: Double) =>
      nanToNull(Ltn.dv01(liq, venc, taxa, pu)))
  private val ntnfPuUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(NtnF.pu(liq, venc, taxa)))
  private val ntnfTaxaUdf = udf((liq: LocalDate, venc: LocalDate, pu: Double) =>
    nanToNull(NtnF.taxa(liq, venc, pu)))
  private val ntnfDurationUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(NtnF.duration(liq, venc, taxa)))
  private val ntnfDv01Udf = udf(
    (liq: LocalDate, venc: LocalDate, taxa: Double, pu: Double) =>
      nanToNull(NtnF.dv01(liq, venc, taxa, pu)))
  private val ntnbCotacaoUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(NtnB.cotacao(liq, venc, taxa)))
  private val ntnbPuUdf = udf((vna: Double, cot: Double) =>
    nanToNull(NtnB.pu(vna, cot)))
  private val ntnbDurationUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(NtnB.duration(liq, venc, taxa)))
  private val ntnbDv01Udf = udf(
    (liq: LocalDate, venc: LocalDate, taxa: Double, pu: Double) =>
      nanToNull(NtnB.dv01(liq, venc, taxa, pu)))
  private val ntncCotacaoUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(NtnC.cotacao(liq, venc, taxa)))
  private val lftCotacaoUdf = udf((liq: LocalDate, venc: LocalDate, taxa: Double) =>
    nanToNull(Lft.cotacao(liq, venc, taxa)))
  private val lftTaxaUdf = udf(
    (liq: LocalDate, venc: LocalDate, vna: Double, pu: Double) =>
      nanToNull(Lft.taxa(liq, venc, vna, pu)))

  def ltn_pu(liq: Column, venc: Column, taxa: Column): Column =
    ltnPuUdf(liq, venc, taxa)
  def ltn_taxa(liq: Column, venc: Column, pu: Column): Column =
    ltnTaxaUdf(liq, venc, pu)
  def ltn_dv01(liq: Column, venc: Column, taxa: Column, pu: Column): Column =
    ltnDv01Udf(liq, venc, taxa, pu)
  def ntnf_pu(liq: Column, venc: Column, taxa: Column): Column =
    ntnfPuUdf(liq, venc, taxa)
  def ntnf_taxa(liq: Column, venc: Column, pu: Column): Column =
    ntnfTaxaUdf(liq, venc, pu)
  def ntnf_duration(liq: Column, venc: Column, taxa: Column): Column =
    ntnfDurationUdf(liq, venc, taxa)
  def ntnf_dv01(liq: Column, venc: Column, taxa: Column, pu: Column): Column =
    ntnfDv01Udf(liq, venc, taxa, pu)
  def ntnb_cotacao(liq: Column, venc: Column, taxa: Column): Column =
    ntnbCotacaoUdf(liq, venc, taxa)
  def ntnb_pu(vna: Column, cot: Column): Column = ntnbPuUdf(vna, cot)
  def ntnb_duration(liq: Column, venc: Column, taxa: Column): Column =
    ntnbDurationUdf(liq, venc, taxa)
  def ntnb_dv01(liq: Column, venc: Column, taxa: Column, pu: Column): Column =
    ntnbDv01Udf(liq, venc, taxa, pu)
  def ntnc_cotacao(liq: Column, venc: Column, taxa: Column): Column =
    ntncCotacaoUdf(liq, venc, taxa)
  def lft_cotacao(liq: Column, venc: Column, taxa: Column): Column =
    lftCotacaoUdf(liq, venc, taxa)
  def lft_taxa(liq: Column, venc: Column, vna: Column, pu: Column): Column =
    lftTaxaUdf(liq, venc, vna, pu)
}
