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
  * Intent format: new intents pin BY NAME — one `<name>:<version>`
  * entry per sub-table, where the name is the table path's last
  * segment (unique within a journal root by construction; enforced at
  * write). Replay restores each pinned NAME it finds in the caller's
  * list and fails loudly on a pinned name the caller no longer passes
  * — so growing the list is safe by insertion or reorder, not just by
  * appending, and a shrunk list (corruption) can never silently roll
  * back the wrong table.
  *
  * Legacy intents (bare space-separated versions, written before the
  * named format) carry no names, so for them the old upgrade rule
  * still applies: the sub-table list may only have GROWN by APPENDING
  * — replay zips the pinned prefix. An intent longer than the caller's
  * list means the caller passed the wrong journal or shrank the list;
  * replay fails naming the manual remediation rather than guessing.
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
    val segs = subs.map(TxnJournal.seg)
    // segment uniqueness + whitespace-freedom are NAMED-format
    // invariants (segments key the pins and the format is
    // space-delimited). They are enforced where the named format is
    // in play — writing a new intent, or replaying a named one — but
    // deliberately NOT before the LEGACY replay branch: a pre-upgrade
    // positional intent is valid even when its sub-tables share a
    // last segment (e.g. a/events and b/events), and refusing to
    // replay it would leave the crashed batch unrecoverable.
    def requireNamedSegs(): Unit = {
      require(segs.distinct.size == segs.size,
        s"sub-table last path segments must be unique within a " +
          s"journal root (they name the pins): $segs")
      val spacey = segs.filter(_.exists(_.isWhitespace))
      require(spacey.isEmpty,
        s"sub-table last path segments must not contain whitespace " +
          s"(the intent format is space-delimited): $spacey")
    }
    if (f.exists(done)) return false
    if (f.exists(intent)) {
      // crashed mid-update: restore pinned pre-batch snapshots
      val in = f.open(intent)
      val line = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      if (line.contains(":")) {
        // named intent: restore each pinned NAME; a pinned name the
        // caller no longer passes is corruption (wrong journal or a
        // shrunk list) — fail with the remediation, never guess
        requireNamedSegs()
        val pinned = line.split(" ").map { e =>
          val i = e.lastIndexOf(':')
          require(i >= 0,
            s"txn journal $intent entry '$e' has no ':' — a corrupt " +
              s"named intent; resolve the crashed batch manually " +
              s"(restore each pinned version, then delete $intent)")
          val v = e.substring(i + 1).toIntOption
          require(v.isDefined,
            s"txn journal $intent entry '$e' has a non-numeric " +
              s"version — a corrupt named intent; resolve the crashed " +
              s"batch manually (restore each pinned version, then " +
              s"delete $intent)")
          (e.substring(0, i), v.get)
        }.toSeq
        val bySeg = segs.zip(subs).toMap
        val unknown = pinned.map(_._1).filterNot(bySeg.contains)
        require(unknown.isEmpty,
          s"txn journal $intent pins tables $unknown the caller did " +
            s"not pass (caller tables: $segs) — wrong journal root or " +
            s"a shrunk sub-table list; resolve the crashed batch " +
            s"manually (restore each pinned version, then delete " +
            s"$intent)")
        pinned.foreach { case (name, v) =>
          val sub = bySeg(name)
          if (VersionedTable.latestVersion(spark, sub) > v)
            VersionedTable.commitOverwrite(
              VersionedTable.read(spark, sub, Some(v)), sub)
        }
      } else {
        val pinned = line.split(" ").map { e =>
          val v = e.toIntOption
          require(v.isDefined,
            s"txn journal $intent entry '$e' is not a version number " +
              s"— a corrupt legacy intent; resolve the crashed batch " +
              s"manually (restore each pinned version, then delete " +
              s"$intent)")
          v.get
        }.toSeq
        // legacy bare-version intent (no names): the list may only
        // have GROWN by APPENDING since it was written — roll back the
        // zipped prefix; the appended tables postdate the intent
        require(pinned.size <= subs.size,
          s"txn journal $intent pins ${pinned.size} tables but the " +
            s"caller passed only ${subs.size} — legacy sub-table " +
            s"lists may only grow by appending; if this journal " +
            s"belongs to an older, larger schema, resolve the crashed " +
            s"batch manually (restore each pinned version, then " +
            s"delete $intent)")
        subs.zip(pinned).foreach { case (sub, v) =>
          if (VersionedTable.latestVersion(spark, sub) > v)
            VersionedTable.commitOverwrite(
              VersionedTable.read(spark, sub, Some(v)), sub)
        }
      }
    } else {
      requireNamedSegs()
      val entries = subs.map(s =>
        s"${TxnJournal.seg(s)}:${VersionedTable.latestVersion(spark, s)}")
      f.mkdirs(txnDir)
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_txn/$tag.tmp")
      val out = f.create(tmp, true)
      out.write(entries.mkString(" ").getBytes("UTF-8"))
      out.close()
      if (!f.rename(tmp, intent)) f.delete(tmp, false)
    }
    apply
    f.mkdirs(txnDir)
    try f.create(done, false).close()
    catch { case _: java.io.IOException => () } // lost claim: done
    true
  }

  /** A sub-table's pin name: the path's last segment. */
  private[graft] def seg(path: String): String =
    path.stripSuffix("/").split('/').last
}
