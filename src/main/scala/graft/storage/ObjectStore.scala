package graft.storage

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Content-addressed object store — the reference's storage scaffolding
  * (`/root/reference/src/sydra/storage/object_store.zig:3-121`, ADR 0006)
  * re-expressed AND wired in: the reference ships the blob store but never
  * connects it to any path; here it backs deduplicated snapshots of a
  * [[SeriesStore]] (unchanged segment files share one object across
  * snapshots) with ref-rooted garbage collection.
  *
  * Object model mirrors the reference: blob(1)/tree(2)/commit(3)/ref(4)
  * typed payloads, id = hash(type byte ‖ payload), objects fanned out as
  * `objects/<2-hex>/<64-hex>` with a `[type:1][len:4 LE]` header, puts of
  * existing content short-circuit (the dedup). One deliberate deviation:
  * the content hash is JDK SHA-256, not BLAKE3 — there is no vetted
  * offline BLAKE3 for the JVM, byte-compatibility buys nothing (the
  * reference never produces these files on any executable path), and the
  * mechanism — collision-resistant content addressing — is
  * hash-algorithm-agnostic.
  *
  * Scale shape: this is DRIVER-SIDE metadata machinery (snapshot
  * manifests, maintenance), not a data-plane operator — the payloads it
  * moves are segment FILES, streamed through a digest, never loaded into
  * executor memory. At real scale the same layout maps onto an object
  * bucket (S3-style) with the identical id scheme. `rootPath` must live
  * on storage SHARED by every driver that snapshots or restores (NFS/
  * fuse-mounted bucket on a real cluster): the implementation uses local
  * `java.io.File` I/O deliberately — content-addressed blobs are written
  * once and immutable, so a shared POSIX mount is sufficient and the
  * Hadoop FS indirection buys nothing here — but a driver-local `/tmp`
  * root silently makes snapshots invisible to other drivers.
  */
final class ObjectStore(rootPath: String) {

  import ObjectStore._

  private val root = new File(rootPath)
  new File(root, "objects").mkdirs()
  new File(root, "refs").mkdirs()

  private def objFile(id: String): File =
    new File(new File(new File(root, "objects"), id.substring(0, 2)), id)

  /** Store a typed payload; returns the hex content id. Re-putting
    * existing content is a no-op (the content-address dedup).
    */
  def put(objType: ObjType, payload: Array[Byte]): String = {
    val id = hashId(objType, payload)
    val f = objFile(id)
    if (!f.exists()) {
      f.getParentFile.mkdirs()
      val header = Array[Byte](objType.code,
        (payload.length & 0xff).toByte, ((payload.length >> 8) & 0xff).toByte,
        ((payload.length >> 16) & 0xff).toByte, ((payload.length >> 24) & 0xff).toByte)
      // unique temp per call: two concurrent puts of the same content must
      // not interleave writes to one temp file (the atomic move would then
      // publish corrupt bytes under a valid id); each writer races its OWN
      // complete file to the final path and the loser's move is a no-op
      // overwrite with identical bytes.
      val tmp = File.createTempFile(id + ".", ".tmp", f.getParentFile)
      val out = Files.newOutputStream(tmp.toPath)
      try { out.write(header); out.write(payload) } finally out.close()
      try Files.move(tmp.toPath, f.toPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.FileAlreadyExistsException => tmp.delete() }
    }
    id
  }

  /** Load an object; throws on a missing or corrupt id. */
  def get(id: String): (ObjType, Array[Byte]) = {
    val bytes = Files.readAllBytes(objFile(id).toPath)
    require(bytes.length >= 5, s"corrupt object $id")
    val t = ObjType.of(bytes(0))
    val len = (bytes(1) & 0xff) | ((bytes(2) & 0xff) << 8) |
      ((bytes(3) & 0xff) << 16) | ((bytes(4) & 0xff) << 24)
    require(len == bytes.length - 5, s"corrupt object $id: length mismatch")
    (t, java.util.Arrays.copyOfRange(bytes, 5, 5 + len))
  }

  def writeRef(name: String, id: String): Unit =
    Files.write(Paths.get(root.toString, "refs", name), id.getBytes("UTF-8"))

  def readRef(name: String): Option[String] = {
    val f = new File(new File(root, "refs"), name)
    if (f.exists()) Some(new String(Files.readAllBytes(f.toPath), "UTF-8")) else None
  }

  def deleteRef(name: String): Unit = {
    new File(new File(root, "refs"), name).delete(); ()
  }

  /** Snapshot every file under the store's segment tree as blobs + one
    * tree manifest + one commit (parent = the ref's prior commit), then
    * advance `refName`. Unchanged files hash to existing objects — the
    * incremental-snapshot dedup the plain dir-copy snapshot lacks.
    * Returns the commit id.
    */
  def snapshot(store: SeriesStore, refName: String): String = {
    val segRoot = Paths.get(store.root, "segments")
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    if (Files.exists(segRoot)) {
      val it = Files.walk(segRoot).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (Files.isRegularFile(p)) {
          val rel = segRoot.relativize(p).toString
          entries += ((put(Blob, Files.readAllBytes(p)), rel))
        }
      }
    }
    val manifest = entries.sortBy(_._2)
      .map { case (id, rel) => s"$id\t$rel" }.mkString("\n")
    val treeId = put(Tree, manifest.getBytes("UTF-8"))
    val parent = readRef(refName).map(c => s"parent $c\n").getOrElse("")
    val commitId = put(Commit, s"tree $treeId\n$parent".getBytes("UTF-8"))
    writeRef(refName, commitId)
    commitId
  }

  /** Materialize `refName`'s latest tree into `destSegments`. */
  def restore(refName: String, destSegments: String): Unit =
    restoreCommit(readRef(refName).getOrElse(
      throw new IllegalArgumentException(s"no such ref: $refName")), destSegments)

  /** Time travel: materialize ANY commit from [[log]]'s chain. */
  def restoreCommit(commitId: String, destSegments: String): Unit = {
    val commit = new String(get(commitId)._2, "UTF-8")
    val treeId = commit.linesIterator.next().stripPrefix("tree ")
    val manifest = new String(get(treeId)._2, "UTF-8")
    manifest.linesIterator.filter(_.nonEmpty).foreach { line =>
      val Array(id, rel) = line.split("\t", 2)
      val dest = Paths.get(destSegments, rel)
      Files.createDirectories(dest.getParent)
      Files.write(dest, get(id)._2)
    }
  }

  /** The ref's commit chain, newest first: (commitId, treeId). */
  def log(refName: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = readRef(refName)
    while (cur.isDefined) {
      val id = cur.get
      val commit = new String(get(id)._2, "UTF-8")
      val treeId = commit.linesIterator
        .find(_.startsWith("tree ")).get.stripPrefix("tree ")
      out += ((id, treeId))
      cur = commit.linesIterator
        .find(_.startsWith("parent ")).map(_.stripPrefix("parent "))
    }
    out.toSeq
  }

  /** Drop every object unreachable from the refs (commit → parent chain →
    * trees → blobs). Returns the number of objects deleted.
    */
  def gc(): Int = {
    val live = scala.collection.mutable.HashSet.empty[String]
    def markCommit(id: String): Unit = if (live.add(id)) {
      val commit = new String(get(id)._2, "UTF-8")
      commit.linesIterator.foreach { line =>
        if (line.startsWith("tree ")) {
          val treeId = line.stripPrefix("tree ")
          if (live.add(treeId)) {
            new String(get(treeId)._2, "UTF-8").linesIterator
              .filter(_.nonEmpty).foreach(l => live.add(l.split("\t", 2)(0)))
          }
        } else if (line.startsWith("parent ")) markCommit(line.stripPrefix("parent "))
      }
    }
    val refsDir = new File(root, "refs")
    Option(refsDir.listFiles()).getOrElse(Array.empty[File])
      .foreach(f => markCommit(new String(Files.readAllBytes(f.toPath), "UTF-8")))
    var dropped = 0
    val objDir = new File(root, "objects")
    Option(objDir.listFiles()).getOrElse(Array.empty[File]).foreach { bucket =>
      Option(bucket.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
        if (!live.contains(f.getName)) { f.delete(); dropped += 1 }
      }
    }
    dropped
  }

  /** Total object count (diagnostics / dedup assertions). */
  def objectCount: Int = {
    val objDir = new File(root, "objects")
    Option(objDir.listFiles()).getOrElse(Array.empty[File])
      .map(b => Option(b.listFiles()).getOrElse(Array.empty[File]).length).sum
  }
}

object ObjectStore {
  sealed abstract class ObjType(val code: Byte)
  case object Blob extends ObjType(1)
  case object Tree extends ObjType(2)
  case object Commit extends ObjType(3)
  case object RefObj extends ObjType(4)

  object ObjType {
    def of(b: Byte): ObjType = b match {
      case 1 => Blob
      case 2 => Tree
      case 3 => Commit
      case 4 => RefObj
      case other => throw new IllegalArgumentException(s"unknown object type $other")
    }
  }

  /** id = sha256(type byte ‖ payload), hex — the reference's
    * hash(obj_type, payload) shape (object_store.zig:115-121) on SHA-256.
    */
  def hashId(objType: ObjType, payload: Array[Byte]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(objType.code)
    md.update(payload)
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }
}
