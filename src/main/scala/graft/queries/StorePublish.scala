package graft.queries

import java.io.File
import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}

/** Atomic-publish + cross-process build-mutex protocol for the durable
  * artifact store ([[VectorOps.durableAt]]).
  *
  * Why it exists: the store's original build-if-missing guard was a
  * JVM-local monitor, so the contract held only while exactly one Spark
  * application touched the store — the round-13 close observed exactly the
  * failure that leaves open (three concurrent JVMs sharing
  * spark-warehouse/graft_ann_index corrupted a plan-shape read, ROUNDLOG
  * r14). In production the premise is false by design: many Spark apps
  * (batch rebuilds, streaming servers, ad-hoc sessions) share one artifact
  * store. The protocol here makes that safe with three moves:
  *
  *  1. '''Immutable artifacts, atomic publish.''' A build never writes into
  *     the final path. It writes into a keyed, dot-prefixed temp sibling
  *     (`.tmp_<name>_<pid>_<nonce>`) and publishes with one atomic
  *     `rename(2)` — a reader can observe "absent" or "complete", never a
  *     half-written artifact, and a published path is never rewritten.
  *  2. '''Cross-process build mutex.''' Builders of one key serialize on an
  *     advisory [[java.nio.channels.FileLock]] over a sibling
  *     `.<name>.lock` file; the loser re-checks under the lock and reuses
  *     the winner's publish. OS-level locks die with their process, so a
  *     crashed builder never wedges the key.
  *  3. '''Crash hygiene.''' A temp dir whose builder died is unreachable
  *     garbage. The next builder of the same key reaps it under the key
  *     lock (where no live builder for the key can exist), and
  *     [[VectorOps.vacuumAt]] reaps any dead builder's temp by probing the
  *     key lock — a held lock means a live build, spared conservatively.
  *
  * Portability note (100 TB deployment): `FileLock` + atomic rename are the
  * right primitives for a POSIX shared filesystem (local disk, NFSv4,
  * Lustre). On an object store there is no rename — the same protocol is
  * expressed with a conditional PUT of a small commit marker instead of the
  * lock/rename pair; everything above this object (keys, manifests, vacuum
  * liveness) is storage-agnostic and unchanged.
  */
private[graft] object StorePublish {

  /** An artifact is published iff its committer marker exists. Spark's
    * parquet committer writes `_SUCCESS` inside the (temp) output dir, so
    * after the atomic rename the marker and the data appear together. */
  def published(dir: File): Boolean = new File(dir, "_SUCCESS").exists()

  private def lockFile(vroot: File, name: String): File =
    new File(vroot, s".$name.lock")

  private def tmpPrefix(name: String): String = s".tmp_${name}_"

  /** Owner artifact name of a temp-dir name, if it parses as one
    * (`.tmp_<name>_<pid>_<nonce>` — exactly two suffix tokens stripped;
    * `name` itself may contain underscores). */
  def tmpOwner(tmpName: String): Option[String] =
    if (!tmpName.startsWith(".tmp_")) None
    else {
      val core = tmpName.stripPrefix(".tmp_")
      val i = core.lastIndexOf('_')
      if (i <= 0) None
      else {
        val j = core.lastIndexOf('_', i - 1)
        if (j <= 0) None else Some(core.substring(0, j))
      }
    }

  /** Run `f` holding the key's cross-process build lock (blocking: a peer
    * process building the same key finishes first). Callers inside one JVM
    * are expected to already serialize per key on [[VectorOps]]'s striped
    * store monitors — JVM file locks are per-process, and overlapping
    * same-process acquisition would throw
    * [[OverlappingFileLockException]]. The lock file is left in place
    * (deleting lock files is itself a race). */
  def withKeyLock[A](vroot: File, name: String)(f: => A): A = {
    vroot.mkdirs()
    val ch = FileChannel.open(lockFile(vroot, name).toPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      // Same-JVM overlap is an EXCEPTION, not a wait: a concurrent
      // [[keyLockHeld]] probe (vacuum's liveness test) holds the lock for
      // one tryLock/release instant, and JVM file locks are per-process,
      // so ch.lock() throws OverlappingFileLockException instead of
      // blocking. r14's global store monitor excluded this interleaving
      // by accident; the striped per-key monitors reintroduced it for
      // builder-vs-probe (builders of one key still serialize on the
      // striped monitor). The probe's hold is momentary — retry briefly
      // rather than fail the build (ADVICE r15).
      var lk: java.nio.channels.FileLock = null
      var attempts = 0
      while (lk == null) {
        try lk = ch.lock()
        catch {
          case e: OverlappingFileLockException =>
            attempts += 1
            if (attempts > 1000) throw e // not a probe: a genuine in-JVM
                                         // double-acquire bug — surface it
            Thread.sleep(2)
        }
      }
      try f
      finally lk.release()
    } finally ch.close()
  }

  /** Non-blocking probe: is ANY process (including this one) holding the
    * key's build lock right now? Vacuum uses it to tell a live builder's
    * temp dir from a dead one's. Errs toward "held" — a probe failure must
    * never license deleting a possibly-live build. */
  def keyLockHeld(vroot: File, name: String): Boolean = {
    val lf = lockFile(vroot, name)
    if (!lf.exists()) return false
    try {
      val ch = FileChannel.open(lf.toPath, StandardOpenOption.WRITE)
      try {
        val lk = ch.tryLock()
        if (lk == null) true else { lk.release(); false }
      } finally ch.close()
    } catch {
      case _: OverlappingFileLockException => true // held by THIS JVM
      case scala.util.control.NonFatal(_) => true
    }
  }

  def deleteRecursively(f: File): Unit = {
    new scala.reflect.io.Directory(f).deleteRecursively(); ()
  }

  /** Reap temp dirs for `name` left by dead builders. MUST be called under
    * the key lock: holding it proves no live builder for this key exists,
    * so every matching temp is abandoned by construction. Ownership is
    * parsed EXACTLY via [[tmpOwner]], never by name prefix: artifact names
    * embed sanitized keys, so one name can extend another (`a_b` extends
    * `a`), and a prefix match would let key A's builder delete key B's
    * LIVE temp mid-build (vacuumAt always parsed exactly; this now does
    * too). */
  def cleanStaleTmps(vroot: File, name: String): Unit =
    Option(vroot.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && tmpOwner(f.getName).contains(name))
      .foreach(deleteRecursively)

  /** Build-once across processes. If `vroot/name` is published, returns
    * false without building. Otherwise, under the key lock: re-check (a
    * peer may have published while this call waited), reap dead temps,
    * run `write` into a fresh keyed temp dir, and publish it with one
    * atomic rename. Returns true iff THIS call ran the build.
    *
    * The lost-race catch covers a legacy (non-locking) writer publishing
    * the target underneath us: its artifact stands, ours is discarded —
    * artifacts are deterministic functions of their key, so either copy
    * is correct and immutability wins over last-writer. An occupied
    * target that is NOT published (a pre-protocol build that crashed
    * mid-write: data files, no `_SUCCESS`) is poisoned residue, not a
    * peer's artifact — we hold the key lock, so nothing live owns it;
    * the residue is deleted and the fresh complete build takes its place
    * (the self-heal the old overwrite-in-place path had implicitly).
    *
    * A `write` failure deletes its temp before rethrowing: without that,
    * the dead temp would sit until the NEXT build or vacuum of this key
    * reaps it, and vacuum would report a phantom in the interim. */
  def buildOnce(vroot: File, name: String)(write: File => Unit): Boolean = {
    val target = new File(vroot, name)
    if (published(target)) return false
    withKeyLock(vroot, name) {
      if (published(target)) false
      else {
        cleanStaleTmps(vroot, name)
        val tmp = new File(vroot, s"${tmpPrefix(name)}${ProcessHandle.current().pid()}_${java.lang.Long.toHexString(System.nanoTime())}")
        try write(tmp)
        catch { case e: Throwable => deleteRecursively(tmp); throw e }
        try {
          Files.move(tmp.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
          true
        } catch {
          // Broad FileSystemException on purpose: Linux surfaces a rename
          // onto a non-empty dir as ENOTEMPTY -> the GENERIC
          // FileSystemException (the JDK reserves DirectoryNotEmptyException
          // for delete paths), so catching only the two specific subtypes
          // let exactly the occupied-target case propagate as a crash.
          case e: java.nio.file.FileSystemException =>
            if (published(target)) { deleteRecursively(tmp); false }
            else if (target.exists()) {
              deleteRecursively(target)
              // The retry can itself fail (AccessDenied and
              // AtomicMoveNotSupported are FileSystemExceptions too, and
              // can land in this branch alongside genuine residue) — every
              // exit of buildOnce must leave no temp behind, so clean up
              // before rethrowing like the write-failure path does.
              try {
                Files.move(tmp.toPath, target.toPath,
                  StandardCopyOption.ATOMIC_MOVE)
              } catch {
                case e2: Throwable => deleteRecursively(tmp); throw e2
              }
              true
            } else { deleteRecursively(tmp); throw e }
        }
      }
    }
  }
}
