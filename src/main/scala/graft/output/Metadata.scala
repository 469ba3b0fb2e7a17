package graft.output

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper

/** Export metadata + checksums — the engine analog of the reference's
  * `make_json.make_json` / `get_sha_hash` (datapackage.json with per-column
  * source metadata, file sizes and hashes; SURVEY.md §2.1 S8). The
  * checksum-pinned descriptor doubles as the golden-output mechanism the
  * reference uses for correctness (§5.1).
  */
object Metadata {

  def sha256OfFile(path: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(path)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Write a datapackage-style descriptor for an export directory: every
    * data file with bytes + sha256, plus schema fields per resource —
    * and, via `seriesKeys`, the reference's per-COLUMN source metadata
    * ([pub: make_json.py::make_json]): one descriptor per series with all
    * six header levels (region/domain, variable/metric, attribute,
    * source, web, unit), keyed by the flattened series name the export
    * carries. Callers pass the bounded per-export key list (series
    * cardinality, maxSeries-guarded upstream — never row-scale data).
    */
  def dataPackage(
      name: String,
      exportDir: String,
      resources: Seq[(String, DataFrame)], // (relative dir, frame that produced it)
      seriesKeys: Map[String, Seq[graft.model.SeriesKey]] = Map.empty
  ): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("name", name)
    root.put("created", java.time.Instant.now().toString)
    val res = root.putArray("resources")
    resources.foreach { case (rel, df) =>
      val n = res.addObject()
      n.put("path", rel)
      val fields = n.putArray("fields")
      df.schema.fields.foreach { f =>
        val fn = fields.addObject()
        fn.put("name", f.name)
        fn.put("type", f.dataType.simpleString)
      }
      seriesKeys.get(rel).foreach { keys =>
        val arr = n.putArray("series")
        keys.sortBy(_.flat).foreach { k =>
          val o = arr.addObject()
          o.put("name", k.flat)
          o.put("region", k.domain)
          o.put("variable", k.metric)
          o.put("attribute", k.attribute)
          o.put("source", k.source)
          o.put("web", k.web)
          o.put("unit", k.unit)
        }
      }
      val files = n.putArray("files")
      val dir = Paths.get(exportDir, rel)
      if (Files.isDirectory(dir)) {
        Files.list(dir).iterator().asScala.toSeq
          .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith("."))
          .sortBy(_.getFileName.toString)
          .foreach { p =>
            val fo = files.addObject()
            fo.put("file", p.getFileName.toString)
            fo.put("bytes", Files.size(p))
            fo.put("sha256", sha256OfFile(p))
          }
      }
    }
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    Files.writeString(Paths.get(exportDir, "datapackage.json"), json)
    json
  }
}
