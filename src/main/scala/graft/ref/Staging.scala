package graft.ref

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream

/** Driver-side staging utilities — the reference's S1/S2 surface
  * (`dags/icpe-siretisation.py:19-54`): fetch a tarball over HTTP (or
  * copy from a local path in test environments, `:25-28`) and extract
  * named CSV members, landing files for Spark to scan.
  *
  * Deliberately NOT Spark jobs: one small archive fetched once per run
  * belongs on the driver; the cluster enters at the CSV scan
  * ([[Sources.icpeCsv]]). Extraction refuses path-traversal member
  * names (the "zip-slip" hardening the reference lacks).
  */
object Staging {

  /** S1: fetch `url` to `dest`. A url starting with '/' is treated as a
    * local file and copied — the reference's offline test mode. */
  def fetch(url: String, dest: Path): Path = {
    if (url.startsWith("/")) {
      Files.copy(Paths.get(url), dest, StandardCopyOption.REPLACE_EXISTING)
    } else {
      val client = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.ALWAYS).build()
      val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(dest))
      require(resp.statusCode() / 100 == 2, s"fetch $url -> HTTP ${resp.statusCode()}")
    }
    dest
  }

  /** S2: extract the named members of a .tar.gz into `destDir`;
    * returns the extracted paths in archive order. */
  def extractTarGz(tarGz: Path, destDir: Path, members: Set[String]): Seq[Path] = {
    Files.createDirectories(destDir)
    val in = new TarArchiveInputStream(
      new GZIPInputStream(new BufferedInputStream(new FileInputStream(tarGz.toFile))))
    try {
      Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .filter(e => !e.isDirectory && members.contains(e.getName))
        .map { e =>
          val out = destDir.resolve(e.getName).normalize()
          require(out.startsWith(destDir.normalize()),
            s"refusing traversal path in archive: ${e.getName}")
          val os = new FileOutputStream(out.toFile)
          try in.transferTo(os) finally os.close()
          out
        }.toList
    } finally in.close()
  }
}
