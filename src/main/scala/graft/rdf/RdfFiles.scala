package graft.rdf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Cluster-storage-safe per-file RDF ingestion.
  *
  * The reference's bulk loader walks a local directory with `std::fs`
  * (graph.rs:223-330); on a cluster the submit host's local filesystem
  * is not where the data lives, so listing goes through the Hadoop
  * FileSystem API (HDFS, S3A and `file://` alike) and the bytes are
  * read by the `binaryFile` datasource on the executors. Parsing stays
  * per FILE — RDF/XML, Turtle and TriG are not line-splittable;
  * parallelism comes from the file count. N-Triples/N-Quads are the
  * line-splittable scale path and go through `spark.read.text`.
  */
private[graft] object RdfFiles {

  /** List `path` via Hadoop: a directory yields its files matching
    * `exts` in sorted order (the order blank-node scoping indices are
    * assigned in); a single file yields itself. Fails fast on a
    * missing path instead of surfacing an empty-scan mystery later. */
  def list(spark: SparkSession, path: String, exts: Seq[String]): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && exts.exists(s.getPath.getName.endsWith))
        .map(_.getPath.toString)
        .sorted
    else Seq(st.getPath.toString)
  }

  /** Read each listed file whole through the `binaryFile` datasource,
    * parse it with `parseOne`, and remap blank-node terms with a
    * per-file prefix derived from the file's sorted index — blank node
    * ids are document-scoped in RDF, so ids from different files must
    * not collide. */
  def parsePerFile[A: Encoder](spark: SparkSession, path: String, exts: Seq[String])(
      parseOne: String => Seq[A])(remap: (A, RdfTerm => RdfTerm) => A): Dataset[A] = {
    val files = list(spark, path, exts)
    require(files.nonEmpty, s"no ${exts.mkString("/")} files under: $path")
    // binaryFile normalizes URIs (file:/x vs file:///x), so key the
    // broadcast index map by the scheme-less URI path.
    val idxByPath = files.zipWithIndex.map { case (f, i) => new Path(f).toUri.getPath -> i }.toMap
    val bc = spark.sparkContext.broadcast(idxByPath)
    import spark.implicits._
    spark.read.format("binaryFile").load(files: _*)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val idx = bc.value(new Path(file).toUri.getPath)
        def fix(term: RdfTerm): RdfTerm =
          if (term.kind == RdfTerm.Blank) term.copy(value = s"f${idx}_${term.value}")
          else term
        val content = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        parseOne(content).map(a => remap(a, fix))
      }
  }
}
