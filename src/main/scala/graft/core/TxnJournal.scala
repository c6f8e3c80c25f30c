package graft.core

import org.apache.spark.sql.SparkSession

/** Write-ahead intent journal for exactly-once multi-table
  * [[VersionedTable]] updates inside `foreachBatch` sinks.
  *
  * A batch update spanning N table commits can crash between any two
  * of them; a marker-only protocol (marker after the work) then
  * re-applies the whole batch on replay and double-commits whatever
  * already landed. This journal writes the INTENT first — the current
  * version of every participating table — so a replay that finds the
  * intent without the done-marker first ROLLS BACK: each table whose
  * version advanced past its pinned value gets its pinned snapshot
  * re-published as a new version (append-only versioning makes
  * rollback just another commit), after which the batch re-applies
  * cleanly. Rollback is idempotent (pinned versions are fixed), so a
  * crash mid-rollback re-rolls harmlessly.
  *
  * The intent file is published by write-then-rename: a crash
  * mid-write must never leave a truncated journal that poisons every
  * replay.
  *
  * Upgrade rule: a journal's sub-table list may only GROW, and only by
  * APPENDING (every index here added `deletes` as a 5th component that
  * way). Replay of an intent written before the growth then rolls back
  * exactly the tables the old intent pinned — the appended tables did
  * not exist (or were untouched) when that intent was written, so
  * there is nothing of theirs to restore. An intent LONGER than the
  * caller's list means the caller passed the wrong journal or shrank
  * the list — that is corruption, and replay fails naming the manual
  * remediation rather than guessing.
  */
object TxnJournal {

  /** Run `apply` exactly once for `batchId` over the tables at
    * `subs`. Returns true if the batch ran (or re-ran after rollback),
    * false if its done-marker already existed. */
  def exactlyOnce(spark: SparkSession, root: String, batchId: Long,
      subs: Seq[String])(apply: => Unit): Boolean =
    exactlyOnceTagged(spark, root, s"b$batchId", subs)(apply)

  /** [[exactlyOnce]] under an explicit journal tag — for maintenance
    * operations that share the index's `_txn` directory (so
    * consistent-snapshot readers like [[graft.operators.HybridServe
    * .pinConsistent]] see their open intents) WITHOUT colliding with
    * the streaming sink's `b<batchId>` namespace (e.g. deletion ops
    * use `f<opId>`). Tags are one lowercase letter + digits. */
  def exactlyOnceTagged(spark: SparkSession, root: String, tag: String,
      subs: Seq[String])(apply: => Unit): Boolean = {
    require(tag.matches("[a-z]\\d+"),
      s"journal tag must be a lowercase letter + digits, got '$tag'")
    val fsPath = new org.apache.hadoop.fs.Path(root)
    val f = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txnDir = new org.apache.hadoop.fs.Path(s"$root/_txn")
    val done = new org.apache.hadoop.fs.Path(s"$root/_txn/$tag.done")
    val intent = new org.apache.hadoop.fs.Path(s"$root/_txn/$tag")
    if (f.exists(done)) return false
    if (f.exists(intent)) {
      // crashed mid-update: restore pinned pre-batch snapshots
      val in = f.open(intent)
      val line = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      val pinned = line.split(" ").map(_.toInt).toSeq
      // pre-upgrade intent (see the upgrade rule above): an intent
      // with FEWER tables than the caller's list pins the prefix —
      // roll back just those; the appended tables postdate the intent
      require(pinned.size <= subs.size,
        s"txn journal $intent pins ${pinned.size} tables but the " +
          s"caller passed only ${subs.size} — sub-table lists may " +
          s"only grow by appending; if this journal belongs to an " +
          s"older, larger schema, resolve the crashed batch manually " +
          s"(restore each pinned version, then delete $intent)")
      subs.zip(pinned).foreach { case (sub, v) =>
        if (VersionedTable.latestVersion(spark, sub) > v)
          VersionedTable.commitOverwrite(
            VersionedTable.read(spark, sub, Some(v)), sub)
      }
    } else {
      val versions = subs.map(s => VersionedTable.latestVersion(spark, s))
      f.mkdirs(txnDir)
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_txn/$tag.tmp")
      val out = f.create(tmp, true)
      out.write(versions.mkString(" ").getBytes("UTF-8"))
      out.close()
      if (!f.rename(tmp, intent)) f.delete(tmp, false)
    }
    apply
    f.mkdirs(txnDir)
    try f.create(done, false).close()
    catch { case _: java.io.IOException => () } // lost claim: done
    true
  }
}
