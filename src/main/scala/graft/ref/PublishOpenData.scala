package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps

/** Spark re-expression of the daily `publish_open_data_etl` DAG
  * (`dags/publish-open-data.py:114-126`): Postgres Company → verified
  * filter → non-diffusible flag → CSV export to data.gouv.fr.
  */
object PublishOpenData {

  /** Stage `filter_company_data` (`dags/publish-open-data.py:38-60`):
    * the row loop at `:45-47` (force-verify pure producers) plus the
    * VERIFIED filter at `:50` collapse into one predicate — a company
    * passes iff it is `{PRODUCER}`-typed OR already VERIFIED (P7+P3,
    * SURVEY.md §2.2). The literal `'{PRODUCER}'` match is faithful to
    * the reference's rendering of the Postgres array as text: a
    * multi-type array like `{PRODUCER,TRANSPORTER}` must NOT match.
    */
  def filterCompanies(company: DataFrame): DataFrame =
    company
      .where(col("companyTypes") === "{PRODUCER}" ||
             col("verificationStatus") === "VERIFIED")
      .drop("verificationStatus", "companyTypes")

  /** Stage `join_non_diffusible` (`dags/publish-open-data.py:63-85`):
    * attach `non_diffusible='oui'` where the siret appears in
    * AnonymousCompany (J5 — a left-semi membership flag, broadcast). */
  def joinNonDiffusible(companyFiltered: DataFrame, anonymous: DataFrame): DataFrame =
    RelationalOps.membershipFlag(companyFiltered, "siret",
      anonymous, "siret", "non_diffusible")

  /** Full dataset published daily (`dags/publish-open-data.py:119-123`,
    * minus the HTTP edge — the upload at `:88-104` is a driver-side
    * POST of the collected CSV; `Sources.writeCsv(df, path,
    * singleFile = true)` produces the file to upload). The pandas
    * `to_csv` at `:99` includes the siret index as first column —
    * preserved here as an ordinary column. */
  def etablissementsInscrits(company: DataFrame, anonymous: DataFrame): DataFrame =
    joinNonDiffusible(filterCompanies(company), anonymous)
}
