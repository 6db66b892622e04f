package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Snapshot-table checkpointing — Iceberg semantics emulated over partitioned
 * parquet (no Iceberg jars in /opt/spark/jars; see SURVEY.md §7 "target
 * shape"). Each stage writes its output as an immutable snapshot directory;
 * a pointer file is atomically renamed to commit. Resume = read the latest
 * committed snapshot and skip recompute (north_rule resumability; replaces
 * the reference's PostgreSQL datum/sentence caches,
 * common/PostgresUtils.java + Props.java:371-384).
 *
 * Layout:  <root>/<table>/snap-<n>/  (parquet + _SUCCESS)
 *          <root>/<table>/_latest    (contains "snap-<n>", atomic rename)
 *
 * The thin interface keeps a real Iceberg catalog swappable on a real
 * cluster (spark-submit --packages).
 */
final class TableIO(val root: String, spark: SparkSession) {

  private def tableDir(table: String) = Paths.get(root, table)
  private def latestFile(table: String) = tableDir(table).resolve("_latest")

  def latestSnapshot(table: String): Option[String] = {
    val lf = latestFile(table)
    if (!Files.exists(lf)) None
    else {
      val snap = new String(Files.readAllBytes(lf), "UTF-8").trim
      val dir = tableDir(table).resolve(snap)
      if (Files.exists(dir.resolve("_SUCCESS"))) Some(dir.toString) else None
    }
  }

  def read(table: String): Option[DataFrame] =
    latestSnapshot(table).map(spark.read.parquet(_))

  /** Write the next snapshot and commit it atomically. */
  def write(table: String, df: DataFrame,
            partitionBy: Seq[String] = Nil): DataFrame = {
    val dir = tableDir(table)
    Files.createDirectories(dir)
    val existing = Option(dir.toFile.list()).getOrElse(Array.empty)
      .filter(_.startsWith("snap-"))
      .map(_.stripPrefix("snap-").toInt)
    val next = if (existing.isEmpty) 0 else existing.max + 1
    val snap = s"snap-$next"
    val out = dir.resolve(snap).toString
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(out)
    // commit: write pointer to tmp, atomic rename over _latest
    val tmp = dir.resolve("_latest.tmp")
    Files.write(tmp, snap.getBytes("UTF-8"))
    Files.move(tmp, latestFile(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    spark.read.parquet(out)
  }

  /** Resume-or-compute: the per-stage checkpoint contract. */
  def stage(table: String, partitionBy: Seq[String] = Nil)
           (compute: => DataFrame): DataFrame =
    read(table).getOrElse(write(table, compute, partitionBy))

  /** Pipeline-version guard: stage snapshots are only resumable by the
   *  pipeline layout that wrote them (e.g. whether fills_linked is pre- or
   *  post-symmetric-expansion changes what a resumed stage MEANS, not just
   *  its bytes). A run dir carries a `_pipeline_version` marker; resuming
   *  with a different version — or resuming a pre-versioning dir — is
   *  refused instead of silently producing wrong triples. */
  def ensureVersion(version: String): Unit = {
    val rootDir = Paths.get(root)
    val vf = rootDir.resolve("_pipeline_version")
    if (Files.exists(vf)) {
      val v = new String(Files.readAllBytes(vf), "UTF-8").trim
      require(v == version,
        s"run dir $root was written by pipeline version '$v' but this " +
          s"build is '$version'; resuming would mix incompatible stage " +
          "snapshots — use a fresh run dir")
    } else {
      val hasTables = Option(rootDir.toFile.list()).getOrElse(Array.empty)
        .exists(n => !n.startsWith("_"))
      require(!hasTables,
        s"run dir $root has snapshots but no _pipeline_version marker " +
          "(pre-versioning layout); refusing to resume — use a fresh run dir")
      Files.createDirectories(rootDir)
      Files.write(vf, version.getBytes("UTF-8"))
    }
  }
}
