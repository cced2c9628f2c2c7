package graft.ref

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame

/** S9: the reference's HTTP REST sink (`dags/publish-open-data.py:88-104`)
  * — multipart CSV upload followed by a metadata PUT, as performed
  * against the data.gouv.fr API.
  *
  * Driver-side by design: the published dataset is the SMALL output of
  * the pipeline (the reference collects it with `df.to_csv()`); the
  * cluster's job ends at the final DataFrame. `toCsv` streams via
  * `toLocalIterator` so the driver holds one row at a time plus the
  * output buffer, never the distributed input.
  */
object HttpSink {

  /** Render a (small, final) DataFrame as a CSV string with header —
    * the shape `df.to_csv()` produced at `publish-open-data.py:99`. */
  def toCsv(df: DataFrame): String = {
    val sb = new StringBuilder
    def esc(s: String): String =
      if (s == null) ""
      else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    sb.append(df.columns.map(esc).mkString(",")).append('\n')
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      sb.append((0 until row.length)
        .map(i => esc(if (row.isNullAt(i)) null else row.get(i).toString))
        .mkString(",")).append('\n')
    }
    sb.toString
  }

  private def multipart(boundary: String, filename: String, csv: String): Array[Byte] = {
    val body = new StringBuilder
    body.append(s"--$boundary\r\n")
      .append(s"""Content-Disposition: form-data; name="file"; filename="$filename"\r\n""")
      .append("Content-Type: text/csv\r\n\r\n")
      .append(csv).append("\r\n")
      .append(s"--$boundary--\r\n")
    body.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** POST the CSV as multipart/form-data (upload), then PUT the JSON
    * metadata — the two calls at `publish-open-data.py:97-102`.
    * Returns (upload status, metadata status). */
  def publish(df: DataFrame, uploadUrl: String, metadataUrl: String,
              apiKey: String, filename: String, titleJson: String,
              client: HttpClient = HttpClient.newHttpClient()): (Int, Int) = {
    val boundary = "graft-" + System.nanoTime().toHexString
    val post = HttpRequest.newBuilder(URI.create(uploadUrl))
      .header("X-API-KEY", apiKey)
      .header("Content-Type", s"multipart/form-data; boundary=$boundary")
      .POST(HttpRequest.BodyPublishers.ofByteArray(multipart(boundary, filename, toCsv(df))))
      .build()
    val r1 = client.send(post, HttpResponse.BodyHandlers.ofString())
    val put = HttpRequest.newBuilder(URI.create(metadataUrl))
      .header("X-API-KEY", apiKey)
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(titleJson))
      .build()
    val r2 = client.send(put, HttpResponse.BodyHandlers.ofString())
    (r1.statusCode(), r2.statusCode())
  }
}
