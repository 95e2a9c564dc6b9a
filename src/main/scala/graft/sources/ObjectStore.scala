package graft.sources

import java.io.FileNotFoundException
import java.nio.file.{Files, Paths, StandardCopyOption}

/** S3/K2 — raw object store boundary (SURVEY.md §2.1/§2.2; reference:
  * `pipeline-python/src/pipeline_python/storage/object_store.py:47-94`).
  *
  * Downloads are by exact key — never LIST; the key is reconstructed from
  * lineage metadata (`docs/layer-2-transformation.md:74-78`). A missing
  * object raises `FileNotFoundException` (the reference's 404 mapping).
  * Key layout: `{source}/{dataset}/{yyyy-MM-dd}/{runId}.grib`
  * ([[graft.functions.GridFunctions.s3Key]]).
  */
trait ObjectStore {
  def downloadRaw(key: String, localPath: String): Unit
  def uploadRaw(localPath: String, key: String): Unit
  def exists(key: String): Boolean
}

/** Filesystem-backed implementation (tests / local runs); an S3/MinIO
  * implementation swaps in via the same trait with `hadoop-aws`.
  */
final class LocalObjectStore(root: String) extends ObjectStore {

  private def resolve(key: String) = Paths.get(root, key)

  override def downloadRaw(key: String, localPath: String): Unit = {
    val src = resolve(key)
    if (!Files.exists(src)) throw new FileNotFoundException(s"no such object: $key")
    val dst = Paths.get(localPath)
    Option(dst.getParent).foreach(Files.createDirectories(_))
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
  }

  override def uploadRaw(localPath: String, key: String): Unit = {
    val src = Paths.get(localPath)
    if (!Files.exists(src)) throw new FileNotFoundException(s"no such local file: $localPath")
    val dst = resolve(key)
    Option(dst.getParent).foreach(Files.createDirectories(_))
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
  }

  override def exists(key: String): Boolean = Files.exists(resolve(key))
}
