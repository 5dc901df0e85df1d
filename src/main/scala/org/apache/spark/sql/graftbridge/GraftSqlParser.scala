package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for graft's native operators: a delegating parser that
  * recognizes the statement forms
  *
  * {{{
  * GRAFT_ASOF(left_rel, right_rel, key, left_time, right_time, p1[, p2...])
  * GRAFT_READ('/path/to/versioned/table')             -- newest snapshot
  * GRAFT_READ('/path', 3)                             -- time travel to v3
  * GRAFT_READ('/path', SINCE 3)                       -- delta committed after v3
  * GRAFT_READ('/path', TIMESTAMP '2026-01-01 12:00:00') -- timestamp time travel
  * GRAFT_READ('/deltaPath', WITH ROW IDS)              -- rowTracking _row_id column
  * GRAFT_VERSIONS('/path')                            -- commit history
  * GRAFT_VERSIONS('/path', LIMIT 10)                  -- newest 10 only (bounded reads)
  * GRAFT_DIFF('/path', 1, 3, KEY k)                   -- keyed CDC v1 -> v3
  * GRAFT_DIFF('/path', 1, 3, KEY k, COMPARE a, b)     -- compare only a, b
  * GRAFT_REFRESH('/aggRoot')                          -- incremental matview refresh
  * GRAFT_REFRESH('/aggRoot', FULL)                    -- from-scratch rebuild
  * GRAFT_COMPACT('/path')                             -- fold entries into one dir
  * GRAFT_COMPACT('/path', PARTITION BY p)             -- keep the hive layout
  * GRAFT_COMPACT('/path', ZORDER BY a, b, FILES 8)    -- OPTIMIZE with Z-ORDER
  * GRAFT_VACUUM('/path', KEEP 3, GRACE 0)             -- retire old versions (GRACE ms)
  * GRAFT_CHECKPOINT('/deltaPath'[, PARTS n])          -- fold a Delta log (maintenance)
  * GRAFT_PURGE('/deltaPath', FRACTION 0.05)           -- materialize DV-heavy files (REORG PURGE)
  * GRAFT_CHANGES('/deltaPath', FROM 2[, TO 5][, WITH ROW IDS]) -- Delta change feed span (table_changes)
  * GRAFT_SET_PROPERTIES('/deltaPath', SET 'k'='v'[, ...][, UNSET 'k2'[, ...]]) -- TBLPROPERTIES
  * GRAFT_CONSTRAINT('/deltaPath', ADD name CHECK (expr)) -- ALTER TABLE ADD CONSTRAINT
  * GRAFT_CONSTRAINT('/deltaPath', DROP name)          -- ALTER TABLE DROP CONSTRAINT
  * GRAFT_ALTER('/deltaPath', MAP COLUMNS)             -- enable name-mode column mapping
  * GRAFT_ALTER('/deltaPath', RENAME a TO b)           -- ALTER TABLE RENAME COLUMN
  * GRAFT_ALTER('/deltaPath', DROP COLUMN a)           -- ALTER TABLE DROP COLUMN
  * GRAFT_ALTER('/deltaPath', WIDEN a TO long)         -- ALTER COLUMN TYPE (type widening)
  * GRAFT_RESTORE('/path', 2)                          -- rollback to v2 (zero-copy commit)
  * GRAFT_RESTORE('/path', TAG 'pre-backfill')         -- rollback to a tagged commit
  * GRAFT_BRANCH('/path', 'exp')                       -- zero-copy writable branch of HEAD
  * GRAFT_BRANCH('/path', 'exp', 3)                    -- branch from v3
  * GRAFT_BRANCHES('/path')                            -- list branches
  * GRAFT_PUBLISH('/path', 'exp')                      -- fast-forward main to the branch head
  * GRAFT_PUBLISH('/path', 'exp', FORCE)               -- publish past a diverged fork point
  * GRAFT_REBASE('/path', 'exp')                       -- rebase an append-only branch onto main's head
  * GRAFT_BRANCH_DROP('/path', 'exp')                  -- drop the branch (vacuum reclaims)
  * GRAFT_BRANCH_DIFF('/path', 'exp', KEY k)           -- what publish would change on main
  * GRAFT_DELETE('/path', WHERE k >= 100)              -- stats-pruned row deletes
  * GRAFT_UPDATE('/path', SET v = v + 1, WHERE k < 10) -- stats-pruned in-place update
  * GRAFT_APPEND('/path', SELECT ...)                  -- O(delta) append commit
  * GRAFT_MERGE('/path', KEY k, SELECT ...)            -- file-pruned upsert commit
  * }}}
  *
  * GRAFT_ASOF plans straight onto [[AsOfJoinPlan]] (-> AsOfJoinExec);
  * the GRAFT_READ family exposes [[graft.pipeline.VersionedTable]]'s
  * snapshot / time-travel / incremental reads (parquet format) and
  * GRAFT_VERSIONS its commit index, so a pure-SQL user gets the whole
  * versioned-table read surface without the DataFrame API — compose
  * results into larger SQL by capturing them as temp views, the same
  * chaining the pipeline Sql step uses. Every other statement passes
  * through to Spark's parser unchanged.
  *
  * GRAFT_ASOF's relation arguments resolve through the session catalog
  * (temp views and catalog tables, dotted names allowed); the remaining
  * arguments are bare column names. Semantics, type widening, pruning
  * and the float-key normalization all come from [[AsOfJoinPlan.of]] —
  * this class is syntax only.
  */
class GraftSqlParser(session: org.apache.spark.sql.classic.SparkSession,
                     delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser.{AlterStmt, AppendStmt, AsOfStmt, BranchDiffStmt, BranchDropStmt, BranchStmt, BranchesStmt, ChangesStmt, CheckpointStmt, CompactStmt, ConstraintStmt, DeleteStmt, DiffStmt, MergeStmt, PublishStmt, PurgeStmt, ReadStmt, RebaseStmt, RefreshStmt, RestoreStmt, SetPropsStmt, UpdateStmt, VacuumStmt, VersionsStmt}

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case AsOfStmt(l, r, key, lt, rt, payload) =>
      val payloadCols = payload.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      AsOfJoinPlan.of(session.table(l), session.table(r), key, lt, rt, payloadCols)
        .queryExecution.logical
    case ReadStmt(path, since, version, ts, rowIds) =>
      import graft.pipeline.VersionedTable
      // TIMESTAMP time travel: `yyyy-MM-dd HH:mm:ss[.f]` or ISO-8601
      // instants — delta-spark's timestampAsOf accepts both shapes
      val tsMillis: Option[Long] = Option(ts).map { t =>
        scala.util.Try(java.sql.Timestamp.valueOf(t).getTime).getOrElse(
          scala.util.Try(java.time.Instant.parse(t).toEpochMilli).getOrElse(
            throw new IllegalArgumentException(
              s"GRAFT_READ: cannot parse TIMESTAMP '$t' — use " +
                "'yyyy-MM-dd HH:mm:ss' or an ISO-8601 instant")))
      }
      val df = if (graft.sources.DeltaRead.isDeltaTable(session, path)) {
        // foreign Delta Lake table: same statement, interop reader —
        // snapshot + version time travel; SINCE has no committed-delta
        // meaning on a foreign log, refuse rather than approximate
        if (since != null) throw new IllegalArgumentException(
          s"GRAFT_READ(... SINCE n) is for graft versioned tables; $path is a " +
            "Delta table — read a pinned version and diff, or migrate the table")
        (tsMillis, rowIds != null) match {
          case (Some(_), true) => throw new IllegalArgumentException(
            "GRAFT_READ: WITH ROW IDS composes with VERSION time travel, " +
              "not TIMESTAMP — pin the version")
          case (Some(m), false) => graft.sources.DeltaRead.readAt(session, path, m)
          case (None, true) => graft.sources.DeltaRead.readWithRowIds(
            session, path, Option(version).map(_.toLong))
          case (None, false) =>
            graft.sources.DeltaRead.read(session, path, Option(version).map(_.toLong))
        }
      } else {
        if (rowIds != null) throw new IllegalArgumentException(
          s"GRAFT_READ(... WITH ROW IDS) surfaces the Delta rowTracking feature; " +
            s"$path is a graft versioned table (its stable key is the table key)")
        // honor the format the table's commits recorded — hard-coding
        // parquet would misread a json/orc versioned table that the
        // DataFrame/YAML routes read fine
        val fmt = VersionedTable.tableFormat(session, path).getOrElse("parquet")
        tsMillis match {
          case Some(m) =>
            // newest version committed at or before the timestamp —
            // the same resolution rule as the delta reader's versionAt
            val at = VersionedTable.history(session, path)
              .filter(_.committedAt.getTime <= m)
            require(at.nonEmpty,
              s"GRAFT_READ: timestamp '$ts' predates the earliest surviving " +
                s"commit of the versioned table at $path")
            GraftSqlParser.snapshotRead(session, path,
              Some(at.map(_.version).max), fmt)
          case None =>
            if (since != null) VersionedTable.changesSince(session, path, version.toLong, fmt)
            else GraftSqlParser.snapshotRead(session, path,
              Option(version).map(_.toLong), fmt)
        }
      }
      df.queryExecution.logical
    case DiffStmt(path, from, to, keys, compareOpt) =>
      import graft.pipeline.VersionedTable
      val fmt = VersionedTable.tableFormat(session, path).getOrElse("parquet")
      val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      // COMPARE omitted -> every non-key column of the `to` snapshot
      // (the schema of record for what the diff is ABOUT). Key
      // exclusion is case-INSENSITIVE, matching Spark's identifier
      // resolution — a `KEY K` over column `k` must not leave the key
      // in the compare list (it would project the key attribute twice
      // and break the diff's column references).
      val compare = Option(compareOpt)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(VersionedTable.readVersion(session, path, to.toLong, fmt)
          .columns.toSeq.filterNot(c => keyCols.exists(_.equalsIgnoreCase(c))))
      VersionedTable.diffVersions(session, path, from.toLong, to.toLong,
          keyCols, compare, fmt)
        .queryExecution.logical
    case RefreshStmt(path, full) =>
      import graft.pipeline.MaterializedAgg
      // the refresh ACTS at parse time (the statement's whole point),
      // same eager-commit contract as the versioned write queries; the
      // returned plan reads the rollup the refresh just committed.
      // FULL = from-scratch rebuild, the remedy for a rewrite span.
      if (full != null) MaterializedAgg.rebuild(session, path)
      else MaterializedAgg.refresh(session, path)
      val fmt = MaterializedAgg.viewDef(session, path).map(_.aggFormat).getOrElse("parquet")
      MaterializedAgg.read(session, path, fmt).queryExecution.logical
    case VersionsStmt(path, limit) =>
      import session.implicits._
      if (graft.sources.DeltaRead.isDeltaTable(session, path)) {
        // foreign Delta root: surface its commit versions with the
        // same statement (file counts via snapshot would replay the
        // whole log per version — version list only)
        val vs = graft.sources.DeltaRead.versions(session, path)
        Option(limit).map(_.toInt).fold(vs)(n => vs.sorted.takeRight(n))
          .toDF("version").queryExecution.logical
      } else {
        // LIMIT bounds the manifest reads to the newest N — the audit
        // tail, not the O(V·E) full replay
        val h = graft.pipeline.VersionedTable.history(session, path,
          Option(limit).map(_.toInt).getOrElse(Int.MaxValue))
        // an absent/typo'd table must be LOUD like GRAFT_READ's, not an
        // empty result the user reads as "no commits yet" (a committed
        // versioned table always has >= 1 version)
        if (h.isEmpty) throw new IllegalArgumentException(
          s"versioned table at $path has no committed version")
        h.map(v => (v.version, v.committedAt, v.dataDirs.length))
          .toDF("version", "committed_at", "num_dirs")
          .queryExecution.logical
      }
    case CompactStmt(path, partBy, zorderBy, files) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      val pb = Option(partBy).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val zb = Option(zorderBy).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      // maintenance ACTS at parse time, like GRAFT_REFRESH; the plan
      // returns the resulting (version, entry count) summary row
      if (graft.sources.DeltaRead.isDeltaTable(session, path)) {
        // foreign Delta root: OPTIMIZE through the delta writer. The
        // table's own hive layout is in its log, so PARTITION BY
        // refuses here; ZORDER BY is OPTIMIZE ZORDER (clustered
        // dataChange=false rewrite, FILES = clustered file count)
        require(pb.isEmpty,
          s"GRAFT_COMPACT on the Delta table at $path takes ZORDER BY / FILES " +
            "only — partitioning comes from the Delta log")
        val v = graft.sources.DeltaWrite.compact(session, path,
          Option(files).map(_.toInt).getOrElse(8),
          zorderBy = zb, zorderFiles = Option(files).map(_.toInt).getOrElse(8))
        val n = graft.sources.DeltaRead.snapshot(session, path).files.size
        Seq((v, n)).toDF("version", "num_entries").queryExecution.logical
      } else {
        val v = Option(files).map(_.toInt) match {
          case Some(n) => VersionedTable.compact(session, path, partitionBy = pb,
            zorderBy = zb, zorderFiles = n)
          case None => VersionedTable.compact(session, path, partitionBy = pb, zorderBy = zb)
        }
        val entries = VersionedTable.currentSnapshot(session, path)
          .map(_.dataDirs.length).getOrElse(0)
        Seq((v, entries)).toDF("version", "num_entries").queryExecution.logical
      }
    case VacuumStmt(path, keep, grace) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      if (graft.sources.DeltaRead.isDeltaTable(session, path)) {
        // Delta retention is TIME-based (GRACE ms), not version-count:
        // KEEP has no delta meaning and refuses rather than being
        // silently ignored
        require(keep == null,
          s"GRAFT_VACUUM on the Delta table at $path takes GRACE (ms) only — " +
            "delta retention is mtime-based; KEEP is the versioned protocol's knob")
        val swept = graft.sources.DeltaWrite.vacuum(session, path,
          Option(grace).map(_.toLong).getOrElse(7L * 24 * 3600 * 1000))
        // STABLE output schema across table formats (both columns,
        // nulls for the inapplicable one) so generic consumers of the
        // summary row never see a format-dependent shape
        Seq((graft.sources.DeltaRead.snapshot(session, path).version,
            Some(swept.length): Option[Int], None: Option[Int]))
          .toDF("newest_version", "files_swept", "versions_kept")
          .queryExecution.logical
      } else {
        VersionedTable.vacuum(session, path,
          keep = Option(keep).map(_.toInt).getOrElse(3),
          graceMs = Option(grace).map(_.toLong).getOrElse(3600L * 1000))
        val h = VersionedTable.history(session, path)
        if (h.isEmpty) throw new IllegalArgumentException(
          s"versioned table at $path has no committed version")
        Seq((h.map(_.version).max, None: Option[Int], Some(h.length): Option[Int]))
          .toDF("newest_version", "files_swept", "versions_kept")
          .queryExecution.logical
      }
    case CheckpointStmt(path, parts) =>
      import session.implicits._
      val v = graft.sources.DeltaWrite.checkpoint(session, path,
        Option(parts).map(_.toInt).getOrElse(0))
      Seq(v).toDF("checkpoint_version").queryExecution.logical
    case ChangesStmt(path, fromV, toV, rowIds) =>
      // delta-only: the versioned protocol's keyed CDC is GRAFT_DIFF
      require(graft.sources.DeltaRead.isDeltaTable(session, path),
        s"GRAFT_CHANGES reads a Delta change feed; $path is not a Delta table — " +
          "use GRAFT_DIFF(path, v1, v2, KEY k) for graft versioned tables")
      (if (rowIds != null)
        graft.sources.DeltaRead.readChangesWithRowIds(session, path, fromV.toLong,
          Option(toV).map(_.toLong))
      else graft.sources.DeltaRead.readChanges(session, path, fromV.toLong,
        Option(toV).map(_.toLong))).queryExecution.logical
    case SetPropsStmt(path, setsRaw, unsetRaw) if setsRaw != null || unsetRaw != null =>
      import session.implicits._
      require(graft.sources.DeltaRead.isDeltaTable(session, path),
        s"GRAFT_SET_PROPERTIES targets a Delta table's configuration; $path is " +
          "not a Delta table (graft versioned manifests carry no configuration)")
      val pair = """'([^']+)'\s*=\s*'([^']*)'""".r
      val sets = Option(setsRaw).map(s =>
        pair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap)
        .getOrElse(Map.empty[String, String])
      val single = """'([^']+)'""".r
      val unsets = Option(unsetRaw).map(s =>
        single.findAllMatchIn(s).map(_.group(1)).toSeq).getOrElse(Nil)
      val v = graft.sources.DeltaWrite.setProperties(session, path, sets, unsets)
      Seq((v, sets.size, unsets.size))
        .toDF("version", "n_set", "n_unset").queryExecution.logical
    case ConstraintStmt(path, addName, checkExpr, dropName) =>
      import session.implicits._
      require(graft.sources.DeltaRead.isDeltaTable(session, path),
        s"GRAFT_CONSTRAINT targets a Delta table; $path is not one " +
          "(graft versioned manifests carry no configuration)")
      // ADD validates every existing row BEFORE committing (delta-spark's
      // ALTER TABLE ADD CONSTRAINT contract); writes thereafter enforce
      val v = if (addName != null)
        graft.sources.DeltaWrite.addCheckConstraint(session, path, addName, checkExpr)
      else graft.sources.DeltaWrite.dropCheckConstraint(session, path, dropName)
      Seq(v).toDF("version").queryExecution.logical
    case AlterStmt(path, mapCols, renFrom, renTo, dropCol, widenCol, widenTo) =>
      import session.implicits._
      require(graft.sources.DeltaRead.isDeltaTable(session, path),
        s"GRAFT_ALTER targets a Delta table; $path is not one")
      val v =
        if (mapCols != null) graft.sources.DeltaWrite.enableColumnMapping(session, path)
        else if (renFrom != null)
          graft.sources.DeltaWrite.renameColumn(session, path, renFrom, renTo)
        else if (widenCol != null)
          graft.sources.DeltaWrite.widenColumn(session, path, widenCol,
            org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseDataType(widenTo))
        else graft.sources.DeltaWrite.dropColumn(session, path, dropCol)
      Seq(v).toDF("version").queryExecution.logical
    case PurgeStmt(path, fraction) =>
      import session.implicits._
      val v = graft.sources.DeltaWrite.purgeDvs(session, path,
        Option(fraction).map(_.toDouble).getOrElse(0.05))
      val dvs = graft.sources.DeltaRead.snapshot(session, path).dvs.size
      Seq((v, dvs)).toDF("version", "dvs_remaining").queryExecution.logical
    case RestoreStmt(path, toVersion, toTag) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      if (graft.sources.DeltaRead.isDeltaTable(session, path)) {
        // foreign Delta root: same statement, the delta writer's
        // zero-data-I/O restore commit; tags are a graft-manifest
        // concept and refuse here
        require(toTag == null,
          s"GRAFT_RESTORE(... TAG ...) is for graft versioned tables; the Delta " +
            s"table at $path restores by VERSION")
        val t = toVersion.toLong
        val v = graft.sources.DeltaWrite.restore(session, path, t)
        Seq((v, t)).toDF("version", "restored_to").queryExecution.logical
      } else {
        val target = Option(toVersion).map(_.toLong).getOrElse(
          VersionedTable.taggedVersion(session, path, toTag).getOrElse(
            throw new IllegalArgumentException(
              s"versioned table at $path has no surviving version tagged '$toTag'")))
        val v = VersionedTable.restore(session, path, target)
        Seq((v, target))
          .toDF("version", "restored_to").queryExecution.logical
      }
    case BranchStmt(path, name, fromV) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      // pin the fork version up front so the returned row reports the
      // exact version the branch forked from (current can move under a
      // concurrent writer between create and a re-read)
      val fork = Option(fromV).map(_.toLong).getOrElse(
        VersionedTable.currentSnapshot(session, path).getOrElse(
          throw new IllegalArgumentException(
            s"versioned table at $path has no committed version — nothing to branch")).version)
      VersionedTable.createBranch(session, path, name, Some(fork))
      Seq((name, fork)).toDF("branch", "fork_version").queryExecution.logical
    case BranchesStmt(path) =>
      import session.implicits._
      graft.pipeline.VersionedTable.listBranches(session, path)
        .toDF("branch").queryExecution.logical
    case PublishStmt(path, name, forceKw) =>
      import session.implicits._
      val v = graft.pipeline.VersionedTable.publishBranch(session, path, name,
        force = forceKw != null)
      Seq((name, v)).toDF("branch", "published_version").queryExecution.logical
    case RebaseStmt(path, name) =>
      import session.implicits._
      val v = graft.pipeline.VersionedTable.rebaseBranch(session, path, name)
      Seq((name, v)).toDF("branch", "rebased_version").queryExecution.logical
    case BranchDiffStmt(path, name, keys, compareOpt) =>
      import graft.pipeline.VersionedTable
      val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      // COMPARE omitted -> every non-key column of the BRANCH head (the
      // snapshot the publish would install), same default as GRAFT_DIFF
      val compare = Option(compareOpt)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(VersionedTable.read(session,
            VersionedTable.branchRoot(path, name))
          .columns.toSeq.filterNot(c => keyCols.exists(_.equalsIgnoreCase(c))))
      VersionedTable.branchDiff(session, path, name, keyCols, compare)
        .queryExecution.logical
    case BranchDropStmt(path, name) =>
      import session.implicits._
      val existed = graft.pipeline.VersionedTable.dropBranch(session, path, name)
      Seq((name, existed)).toDF("branch", "dropped").queryExecution.logical
    case DeleteStmt(path, cond) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      // acts at parse time like the other maintenance statements; the
      // condition string is validated by the parser inside commitDelete
      // (an unparsable cond degrades to the conservative full rewrite,
      // an INVALID one fails the filter loudly at execution). A DELTA
      // root routes to the DV-emitting delete — zero data-file I/O.
      val v =
        if (graft.sources.DeltaRead.isDeltaTable(session, path))
          graft.sources.DeltaWrite.delete(session, path, cond)
        else VersionedTable.commitDelete(session, path, cond)
      Seq(v).toDF("version").queryExecution.logical
    case UpdateStmt(path, rest) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      // quote/paren-aware parse: the WHERE boundary and the assignment
      // separators are TOP-LEVEL commas only — commas inside string
      // literals ('a, b') or function arguments (round(x, 2)) never
      // split, so any SQL expression is a legal right-hand side
      val commas = GraftSqlParser.topLevelCommas(rest)
      // WHERE must end at a word boundary: an assignment to a column
      // NAMED with a WHERE prefix (`whereabouts = 2`) is still a SET
      // entry, not the condition clause
      val whereAt = commas.find(i =>
        "(?is)^WHERE\\b.*".r.matches(rest.substring(i + 1).stripLeading())).getOrElse(
        throw new IllegalArgumentException(
          "GRAFT_UPDATE needs `, WHERE <condition>` after the SET list"))
      val setsRaw = rest.substring(0, whereAt)
      val cond = rest.substring(whereAt + 1).stripLeading().drop(5).trim
      require(cond.nonEmpty, "GRAFT_UPDATE: empty WHERE condition")
      val bounds = -1 +: GraftSqlParser.topLevelCommas(setsRaw) :+ setsRaw.length
      val assigns = bounds.sliding(2).map { case Seq(a, b) =>
        setsRaw.substring(a + 1, b).trim
      }.filter(_.nonEmpty).map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"GRAFT_UPDATE: malformed assignment '$a' (expected col = expr)")
        a.take(i).trim -> a.drop(i + 1).trim
      }.toMap
      // a DELTA root routes to the DV-emitting update (zero rewrite of
      // unmatched rows); a versioned root to the stats-pruned rewrite
      val v =
        if (graft.sources.DeltaRead.isDeltaTable(session, path))
          graft.sources.DeltaWrite.update(session, path, cond, assigns)
        else VersionedTable.commitUpdate(session, path, cond, assigns)
      Seq(v).toDF("version").queryExecution.logical
    case AppendStmt(path, query) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      // the inner query parses through SPARK'S parser (full SQL — temp
      // views, joins, CTEs), resolves against the session catalog, and
      // commits as an O(delta) append; same eager-at-parse contract as
      // the other mutating statements
      val df = org.apache.spark.sql.classic.Dataset.ofRows(
        session, delegate.parsePlan(query))
      val fmt = VersionedTable.tableFormat(session, path).getOrElse("parquet")
      val v = VersionedTable.commitDelta(session, path, fmt, df)
      Seq(v).toDF("version").queryExecution.logical
    case MergeStmt(path, key, query) =>
      import graft.pipeline.VersionedTable
      import session.implicits._
      val df = org.apache.spark.sql.classic.Dataset.ofRows(
        session, delegate.parsePlan(query))
      val fmt = VersionedTable.tableFormat(session, path).getOrElse("parquet")
      // file-pruned upsert on the named key: source rows win, unmatched
      // base rows survive (commitMerge's default merge function)
      val v = VersionedTable.commitMerge(session, path, fmt, df, Seq(key.trim))
      Seq(v).toDF("version").queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = sqlText match {
    case AsOfStmt(_, _, _, _, _, _) | ReadStmt(_, _, _, _) | VersionsStmt(_, _) |
         DiffStmt(_, _, _, _, _) | RefreshStmt(_, _) | CompactStmt(_, _, _, _) |
         VacuumStmt(_, _, _) | DeleteStmt(_, _) | UpdateStmt(_, _) |
         AppendStmt(_, _) |
         MergeStmt(_, _, _) | RestoreStmt(_, _, _) | CheckpointStmt(_, _) |
         PurgeStmt(_, _) | ChangesStmt(_, _, _, _) | SetPropsStmt(_, _, _) |
         ConstraintStmt(_, _, _, _) | AlterStmt(_, _, _, _, _) =>
      parsePlan(sqlText)
    case _ => delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** GRAFT_READ's snapshot/time-travel reads ROUTE THROUGH THE DSv2
    * FACE for flat parquet layouts: pure-SQL users then get
    * manifest-stat data skipping and full native pushdown on the
    * scan, same as `spark.read.format("graft")` (an outer WHERE on a
    * clustered column plans only the matching files). Hive-partitioned
    * layouts are probed EAGERLY (the DSv2 refusal is otherwise lazy,
    * surfacing at execution) and fall back to the per-branch V1 union
    * read, as do non-parquet formats and never-committed roots (whose
    * V1 error message is the canonical loud one).
    */
  private def snapshotRead(session: org.apache.spark.sql.SparkSession, path: String,
                           version: Option[Long], fmt: String): org.apache.spark.sql.DataFrame = {
    import graft.pipeline.VersionedTable
    if (fmt == "parquet") {
      val pinned = version.orElse(VersionedTable.currentSnapshot(session, path).map(_.version))
      pinned.foreach { v =>
        try {
          VersionedTable.snapshotFiles(session, path, v) // flat-layout probe
          return session.read.format("graft")
            .option("versionAsOf", v.toString).load(path)
        } catch { case _: UnsupportedOperationException => () } // hive layout
      }
    }
    version match {
      case None => VersionedTable.read(session, path, fmt)
      case Some(v) => VersionedTable.readVersion(session, path, v, fmt)
    }
  }
  /** Anchored statement matcher — deliberately strict (identifiers
    * only) so anything else, including look-alike typos with string
    * literals or expressions, falls through to Spark's parser and
    * fails with its normal diagnostics.
    */
  private val AsOfStmt =
    """(?is)^\s*GRAFT_ASOF\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*,\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s*;?\s*$""".r

  /** Path is a single-quoted literal (no embedded quotes — a path that
    * needs one should use the DataFrame API); the optional second
    * argument is a bare version number (≤18 digits, so `.toLong` cannot
    * overflow — a wider literal falls through to Spark's parser and its
    * normal diagnostics, per the strict-fallthrough contract above),
    * `SINCE <n>` selecting the incremental read instead of time travel.
    */
  private val ReadStmt =
    ("""(?is)^\s*GRAFT_READ\s*\(\s*'([^']+)'\s*""" +
      """(?:,\s*(?:(SINCE)\s+)?(\d{1,18})\s*|,\s*TIMESTAMP\s+'([^']+)'\s*)?""" +
      """(?:,?\s*WITH\s+(ROW\s+IDS)\s*)?\)\s*;?\s*$""").r

  private val VersionsStmt =
    """(?is)^\s*GRAFT_VERSIONS\s*\(\s*'([^']+)'\s*(?:,\s*LIMIT\s+(\d{1,9})\s*)?\)\s*;?\s*$""".r

  /** Keyed CDC between two committed versions: path literal, two bare
    * version numbers (≤18 digits like ReadStmt's), a KEY column list,
    * and an optional COMPARE column list (defaults to all non-key
    * columns). The key list is non-greedy so the optional COMPARE
    * clause is not swallowed into it.
    */
  private val DiffStmt =
    """(?is)^\s*GRAFT_DIFF\s*\(\s*'([^']+)'\s*,\s*(\d{1,18})\s*,\s*(\d{1,18})\s*,\s*KEY\s+(\w+(?:\s*,\s*\w+)*?)(?:\s*,\s*COMPARE\s+(\w+(?:\s*,\s*\w+)*))?\s*\)\s*;?\s*$""".r

  /** Incremental materialized-view maintenance by rollup root alone —
    * the view's shape comes from the `_matview` definition its first
    * refresh persisted; returns the freshly-refreshed rollup. The
    * optional FULL keyword forces the from-scratch rebuild.
    */
  private val RefreshStmt =
    """(?is)^\s*GRAFT_REFRESH\s*\(\s*'([^']+)'\s*(?:,\s*(FULL)\s*)?\)\s*;?\s*$""".r

  /** Maintenance compaction (OPTIMIZE): optional PARTITION BY keeps
    * the hive layout through the rewrite, optional ZORDER BY turns it
    * into OPTIMIZE-with-ZORDER (FILES caps the clustered file count,
    * default 8). The zorder column list is non-greedy so the optional
    * FILES clause is not swallowed into it (DiffStmt's KEY/COMPARE
    * pattern).
    */
  private val CompactStmt =
    """(?is)^\s*GRAFT_COMPACT\s*\(\s*'([^']+)'\s*(?:,\s*PARTITION\s+BY\s+(\w+(?:\s*,\s*\w+)*?)\s*)?(?:,\s*ZORDER\s+BY\s+(\w+(?:\s*,\s*\w+)*?)\s*)?(?:,\s*FILES\s+(\d{1,9}))?\s*\)\s*;?\s*$""".r

  /** Version retention: KEEP = surviving version count (default 3),
    * GRACE = unreferenced-directory grace window in MILLISECONDS
    * (default 1 h — the concurrent-reader retention; 0 only when no
    * reader/writer can be concurrent). On a DELTA root, GRACE is the
    * mtime retention (default 7 d) and KEEP refuses.
    */
  private val VacuumStmt =
    """(?is)^\s*GRAFT_VACUUM\s*\(\s*'([^']+)'\s*(?:,\s*KEEP\s+(\d{1,9}))?(?:\s*,\s*GRACE\s+(\d{1,18}))?\s*\)\s*;?\s*$""".r

  /** Delta-only maintenance pair: fold the log into a checkpoint;
    * materialize DV-heavy files (REORG PURGE — FRACTION is the
    * deleted-rows threshold, default 0.05).
    */
  private val CheckpointStmt =
    """(?is)^\s*GRAFT_CHECKPOINT\s*\(\s*'([^']+)'\s*(?:,\s*PARTS\s+(\d{1,9})\s*)?\)\s*;?\s*$""".r
  private val PurgeStmt =
    """(?is)^\s*GRAFT_PURGE\s*\(\s*'([^']+)'\s*(?:,\s*FRACTION\s+([0-9.]{1,12}))?\s*\)\s*;?\s*$""".r

  /** Delta CHANGE DATA FEED span read (delta-spark's `table_changes`):
    * table columns + _change_type/_commit_version/_commit_timestamp
    * over commits FROM..TO (TO defaults to the head). WITH ROW IDS
    * additionally keys every change row with its stable `_row_id`
    * (rowTracking tables — [[graft.sources.DeltaRead.readChangesWithRowIds]]).
    */
  private val ChangesStmt =
    """(?is)^\s*GRAFT_CHANGES\s*\(\s*'([^']+)'\s*,\s*FROM\s+(\d{1,18})(?:\s*,\s*TO\s+(\d{1,18}))?(?:\s*,\s*(WITH\s+ROW\s+IDS))?\s*\)\s*;?\s*$""".r

  /** ALTER TABLE SET/UNSET TBLPROPERTIES for Delta roots: one
    * metaData-only commit; enabling CDF upgrades the protocol in the
    * same commit (DeltaWrite.setProperties).
    */
  private val SetPropsStmt =
    ("""(?is)^\s*GRAFT_SET_PROPERTIES\s*\(\s*'([^']+)'\s*""" +
      """(?:,\s*SET\s+('[^']+'\s*=\s*'[^']*'(?:\s*,\s*'[^']+'\s*=\s*'[^']*')*))?""" +
      """(?:,\s*UNSET\s+('[^']+'(?:\s*,\s*'[^']+')*))?\s*\)\s*;?\s*$""").r

  /** ALTER-COLUMN family: MAP COLUMNS (enable name-mode column
    * mapping), RENAME a TO b, DROP COLUMN a, WIDEN a TO long
    * (type widening — round 17) — all metaData-only
    * commits on the Delta log.
    */
  private val AlterStmt =
    ("""(?is)^\s*GRAFT_ALTER\s*\(\s*'([^']+)'\s*,\s*""" +
      """(?:(MAP\s+COLUMNS)|RENAME\s+(\w+)\s+TO\s+(\w+)|DROP\s+COLUMN\s+(\w+)|WIDEN\s+(\w+)\s+TO\s+(\w+))\s*\)\s*;?\s*$""").r

  /** CHECK constraints: ADD name CHECK (expr) — the expression capture
    * is greedy, so nested parens inside it are fine — or DROP name.
    */
  private val ConstraintStmt =
    ("""(?is)^\s*GRAFT_CONSTRAINT\s*\(\s*'([^']+)'\s*,\s*""" +
      """(?:ADD\s+(\w+)\s+CHECK\s*\((.+)\)|DROP\s+(\w+))\s*\)\s*;?\s*$""").r

  /** Rollback: republish version N's (or tag T's) entry set as a new
    * commit (zero data I/O; Delta's RESTORE TABLE ... VERSION AS OF
    * shape).
    */
  private val RestoreStmt =
    """(?is)^\s*GRAFT_RESTORE\s*\(\s*'([^']+)'\s*,\s*(?:(\d{1,18})|TAG\s+'([^']+)')\s*\)\s*;?\s*$""".r

  /** Branching (zero-copy writable clones inside the table root):
    * create (optionally from a pinned version), list, fast-forward
    * main to a branch head, drop. Branch READS/WRITES need no new
    * syntax — every path-taking statement accepts the
    * `path#branch=name` form (GRAFT_READ('/t#branch=exp'),
    * GRAFT_APPEND, GRAFT_DELETE, GRAFT_MERGE, GRAFT_RESTORE,
    * GRAFT_VERSIONS all operate on the named branch).
    */
  private val BranchStmt =
    """(?is)^\s*GRAFT_BRANCH\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*(?:,\s*(\d{1,18}))?\s*\)\s*;?\s*$""".r
  private val BranchesStmt =
    """(?is)^\s*GRAFT_BRANCHES\s*\(\s*'([^']+)'\s*\)\s*;?\s*$""".r
  private val PublishStmt =
    """(?is)^\s*GRAFT_PUBLISH\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*(?:,\s*(FORCE))?\s*\)\s*;?\s*$""".r
  private val RebaseStmt =
    """(?is)^\s*GRAFT_REBASE\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*;?\s*$""".r
  private val BranchDropStmt =
    """(?is)^\s*GRAFT_BRANCH_DROP\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*;?\s*$""".r
  private val BranchDiffStmt =
    """(?is)^\s*GRAFT_BRANCH_DIFF\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*KEY\s+(\w+(?:\s*,\s*\w+)*?)(?:\s*,\s*COMPARE\s+(\w+(?:\s*,\s*\w+)*?))?\s*\)\s*;?\s*$""".r

  /** Row-level delete: the condition is everything after `WHERE` up to
    * the closing paren (it may contain commas/quotes — trailing-anchor
    * match, so a cond containing `)` needs the Scala API).
    */
  private val DeleteStmt =
    """(?is)^\s*GRAFT_DELETE\s*\(\s*'([^']+)'\s*,\s*WHERE\s+([^)]+)\)\s*;?\s*$""".r

  /** In-place update: everything after `SET ` captures raw; the
    * handler splits the assignment list and the `, WHERE` boundary on
    * TOP-LEVEL commas (quote- and paren-aware — see topLevelCommas).
    */
  private val UpdateStmt =
    """(?is)^\s*GRAFT_UPDATE\s*\(\s*'([^']+)'\s*,\s*SET\s+(.+)\)\s*;?\s*$""".r

  /** Positions of commas at nesting depth 0 and outside single-quoted
    * SQL string literals — the only commas that separate statement
    * clauses (a comma inside 'a, b' or round(x, 2) never splits).
    */
  private[graftbridge] def topLevelCommas(s: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var inQ = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 => out += i
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** Pure-SQL writes: the second argument is a FULL Spark SQL query
    * (greedy up to the final closing paren, so nested parens inside
    * the query are fine), parsed by the delegate and committed through
    * the versioned protocol — append = O(delta) pointer commit, merge
    * = the file-pruned upsert on KEY.
    */
  private val AppendStmt =
    """(?is)^\s*GRAFT_APPEND\s*\(\s*'([^']+)'\s*,\s*(.+)\)\s*;?\s*$""".r
  private val MergeStmt =
    """(?is)^\s*GRAFT_MERGE\s*\(\s*'([^']+)'\s*,\s*KEY\s+(\w+)\s*,\s*(.+)\)\s*;?\s*$""".r
}
