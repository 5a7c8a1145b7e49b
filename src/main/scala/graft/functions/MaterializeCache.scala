package graft.functions

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Per-JVM materialize-once cache for the `q_prod_*` twins (ADVICE r12):
  * the prod queries serve derivative reports from a STORED parquet table
  * written once per corpus dir, and this object owns the once-ness.
  *
  * Three properties the earlier per-file `ConcurrentHashMap[dir, path]`
  * caches lacked:
  *
  *  1. **Content-keyed**: the cache key includes a fingerprint of the
  *     corpus dir (relative path + size + mtime of every data file), so
  *     a dir whose contents change within a JVM re-materializes instead
  *     of silently serving stale tables.
  *  2. **Cleaned up**: every temp dir this cache creates is removed by a
  *     shutdown hook — repeated JVMs no longer leak
  *     `graft_prod_*` directories into the system temp.
  *  3. **Scoped**: the local-temp-path design is a LOCAL-MODE harness
  *     convenience — the declared-query gate requires each query to be
  *     self-contained, so the "stored table" must be synthesized inside
  *     the JVM. A real cluster deployment never uses this path: it runs
  *     [[graft.operators.CurationOps.curationRun]] (or the streaming
  *     maintainers) against an EXPLICIT shared `outDir` on distributed
  *     storage and serves the `*From` entry points from there.
  */
object MaterializeCache {
  // CompletableFuture memoization, NOT computeIfAbsent(write): the write
  // callbacks nest (prodCurationFunnel's stage lambda calls
  // materializedGroups, which is itself a getOrWrite on "prod_groups"),
  // and computeIfAbsent's contract forbids touching other mappings of the
  // same map from inside the mapping function — two keys landing in one
  // bin would throw IllegalStateException("Recursive update") (ADVICE
  // r13). putIfAbsent reserves the key without holding any bin lock, so
  // the write runs unlocked and may freely getOrWrite OTHER keys; a
  // concurrent caller of the same key blocks on the future instead.
  private val cache =
    new ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[String]]()
  private val created = ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(p => deleteRecursively(p))
  }, "graft-materialize-cache-cleanup"))

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => deleteRecursively(c))
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () }

  /** Cheap content fingerprint of a local corpus dir: md5 over the
    * sorted (relative-path, size, mtime) triples of every regular file.
    * Never reads file bytes — at any corpus size this is one directory
    * walk of metadata, and parquet writers always bump size/mtime. */
  private[graft] def fingerprint(dir: String): String = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return "absent"
    val md = java.security.MessageDigest.getInstance("MD5")
    val files = {
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[Path])
      finally s.close()
    }
    files.map { p =>
      s"${root.relativize(p)}|${Files.size(p)}|" +
        s"${Files.getLastModifiedTime(p).toMillis}"
    }.sorted.foreach(line => md.update((line + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The materialized-table dir for (`tag`, `dir`, current contents):
    * on first call per key, creates a temp dir, runs `write` into it,
    * and registers it for shutdown cleanup; later calls with an
    * unchanged corpus return the same path instantly. `write` runs at
    * most once per key (computeIfAbsent's contract). */
  def getOrWrite(tag: String, dir: String)(write: String => Unit): String = {
    val key = s"$tag|$dir|${fingerprint(dir)}"
    // Retry loop (ADVICE r14): a waiter blocked on a future whose write
    // FAILS must loop back to putIfAbsent and attempt the write itself —
    // computeIfAbsent semantics, where a failed mapping is discarded and
    // the next caller recomputes — rather than rethrowing the loser's
    // error. The failing writer still sees its own original exception.
    while (true) {
      val fresh = new java.util.concurrent.CompletableFuture[String]()
      val prior = cache.putIfAbsent(key, fresh)
      if (prior == null) {
        try {
          val out = Files.createTempDirectory(s"graft_$tag")
          created.add(out)
          write(out.toString)
          fresh.complete(out.toString)
          return out.toString
        } catch {
          case t: Throwable =>
            cache.remove(key, fresh) // let a later caller retry the write
            fresh.completeExceptionally(t)
            throw t
        }
      } else {
        try return prior.join()
        catch {
          case _: java.util.concurrent.CompletionException
             | _: java.util.concurrent.CancellationException =>
            () // the writer we waited on failed; loop and retry
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
