package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Atomic publish of a deterministic-content cache directory.
  *
  * Writers stage into a process-unique sibling path, then one rename
  * publishes it. Two processes that race both produce byte-equivalent
  * content (the cache key embeds a content tag over the generating
  * constants), so the loser's staging copy is surplus and discarded —
  * no reader can observe a half-written cache, unlike
  * check-then-`overwrite` on the shared path.
  *
  * Recovery (ADVICE r4): a dir WITHOUT `_SUCCESS` squatting on the
  * target is a partial left by a killed earlier run — serving it would
  * be silent data loss. On rename failure the publisher distinguishes
  * the two cases: committed dir present → discard staging; stale
  * partial → evict it and retry the publish once.
  */
object AtomicCache {

  def deleteRec(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }

  private def isCommitted(dir: Path): Boolean =
    Files.exists(dir.resolve("_SUCCESS"))

  /** Run `write(stagingPath)` and publish its output at `dir` unless a
    * committed copy is already there. `write` must leave a `_SUCCESS`
    * marker in the staging dir (Spark's parquet committer does). */
  def materialize(dir: Path)(write: String => Unit): Unit = {
    if (!isCommitted(dir)) {
      val staging = Paths.get(dir.toString +
        s"_stg_${ProcessHandle.current().pid()}_${System.nanoTime()}")
      // a writer that dies mid-staging must not leave the partial
      // staging dir behind (it is process-unique, so nothing else
      // would ever reclaim it)
      try write(staging.toString)
      catch { case e: Throwable => deleteRec(staging); throw e }
      try Files.move(staging, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.AccessDeniedException |
             _: java.nio.file.FileSystemException =>
          if (isCommitted(dir)) deleteRec(staging) // lost the race — surplus
          else {
            // Evict the squatter by renaming it ASIDE, never deleting in
            // place: between the isCommitted check and an in-place delete
            // a racer can publish a committed copy, which the delete
            // would tear out from under a third process's in-flight read
            // (ADVICE r5). The atomic rename-aside lets us inspect the
            // evicted dir at leisure — if it turns out to be a racer's
            // commit we restore it; only a genuinely uncommitted partial
            // is ever deleted.
            val evicted = Paths.get(dir.toString +
              s"_evicted_${ProcessHandle.current().pid()}_${System.nanoTime()}")
            try Files.move(dir, evicted, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              // the ONLY benign eviction failure is "dir is already
              // gone" (a racer evicted it first); a squatter we could
              // neither commit over nor move aside (permissions, open
              // handles) must fail THIS materialize loudly — pressing
              // on would delete the good staging copy and return
              // success with an uncommitted partial still published
              case e: java.nio.file.FileSystemException
                  if Files.exists(dir) && !isCommitted(dir) =>
                deleteRec(staging)
                throw new java.io.IOException(
                  s"AtomicCache: cannot evict stale partial at $dir", e)
              case _: java.nio.file.FileSystemException => () // racer evicted it
            }
            if (isCommitted(evicted)) {
              // the squatter had become a committed copy — put it back
              try Files.move(evicted, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch {
                case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
                  deleteRec(evicted) // a racer re-published meanwhile — equivalent copy is live
              }
              deleteRec(staging) // dir committed either way — staging is surplus
            } else {
              deleteRec(evicted) // genuinely stale partial, now process-private — safe
              try Files.move(staging, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch {
                case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
                  // a racer beat the retry — but only treat it as a
                  // benign loss if a COMMITTED copy is actually live;
                  // anything else is the same silent-partial hazard as
                  // the eviction failure above
                  if (isCommitted(dir)) deleteRec(staging)
                  else {
                    deleteRec(staging)
                    throw new java.io.IOException(
                      s"AtomicCache: publish retry failed and no " +
                        s"committed copy exists at $dir")
                  }
              }
            }
          }
      }
    }
  }
}
