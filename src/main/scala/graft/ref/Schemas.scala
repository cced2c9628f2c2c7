package graft.ref

import org.apache.spark.sql.types._

/** Hand-written schemas for the reference's six datasets — explicit
  * schema-on-read, mirroring the reference's `names`/`dtype` declarations
  * (no inference: identifier columns carry leading zeros and must stay
  * strings, reference `dags/icpe-siretisation.py:91,103,114-120` and the
  * `'0' + index` fix at `:279-280`).
  */
object Schemas {

  private def s(n: String) = StructField(n, StringType)
  private def ts(n: String) = StructField(n, TimestampType)

  /** IC_etablissement.csv — 24 raw columns
    * (`dags/icpe-siretisation.py:67-92`). */
  val etablissementRaw: StructType = StructType(Seq(
    s("codeS3ic"), s("s3icNumeroSiret"),
    s("x"), s("y"), s("region"),
    s("nomEts"),
    s("codeCommuneEtablissement"), s("codePostal"),
    s("etatActivite"),
    s("codeApe"), s("nomCommune"),
    s("seveso"), s("regime"),
    s("prioriteNationale"),
    s("ippc"),
    s("declarationAnnuelle"),
    s("familleIc"),
    s("baseIdService"),
    s("natureIdService"), s("adresse1"), s("adresse2"),
    ts("dateInspection"),
    s("indicationSsp"),
    s("rayon"), s("precisionPositionnement")))

  /** The 10 columns the pipeline keeps (`usecols`,
    * `dags/icpe-siretisation.py:93-94`). */
  val etablissementKeep: Seq[String] = Seq(
    "codeS3ic", "s3icNumeroSiret", "nomEts", "familleIc", "regime",
    "seveso", "codePostal", "nomCommune", "adresse1", "adresse2")

  /** IC_installation_classee.csv — 8 columns
    * (`dags/icpe-siretisation.py:98-105`). */
  val installation: StructType = StructType(Seq(
    s("codeS3ic"), s("id"),
    StructField("volume", DoubleType),
    s("unite"),
    ts("date_debut_exploitation"), ts("date_fin_validite"),
    s("statut_ic"), s("id_ref_nomencla_ic")))

  /** IC_ref_nomenclature_ic.csv — 10 columns
    * (`dags/icpe-siretisation.py:110-120`). */
  val rubrique: StructType = StructType(Seq(
    s("id"), s("rubrique_ic"), s("famille_ic"), s("sfamille_ic"),
    s("ssfamille_ic"), s("alinea"), s("libellecourt_activite"),
    s("id_regime"),
    StructField("envigueur", IntegerType),
    StructField("ippc", IntegerType)))

  /** GEREP headered CSV (`dags/icpe-siretisation.py:268-271`): the three
    * used columns, all strings (Annee is a sort key, kept lexicographic
    * like pandas' str dtype). */
  val gerep: StructType = StructType(Seq(
    StructField("Code établissement", StringType),
    StructField("Numero Siret", StringType),
    StructField("Annee", StringType)))

  /** Postgres Company projection used by the siretisation DAG
    * (`dags/icpe-siretisation.py:230-233`). */
  val companySiret: StructType = StructType(Seq(
    s("siret"), s("nom"), s("address")))

  /** Postgres Company projection used by publish-open-data
    * (`dags/publish-open-data.py:26-30`). */
  val companyOpenData: StructType = StructType(Seq(
    s("siret"),
    StructField("date_inscription", DateType),
    s("companyTypes"), s("nom"), s("verificationStatus")))

  /** Postgres AnonymousCompany (`dags/publish-open-data.py:70-73`). */
  val anonymousCompany: StructType = StructType(Seq(s("siret")))
}
