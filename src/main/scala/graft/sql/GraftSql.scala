package graft.sql

import graft.table.{GraftCatalog, PartitionSpec, Transform}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedFunction, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedProcedure, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.expressions.{And, Between, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, NamedArgumentExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AlterColumns, Assignment, Call, CreateNamespace, CreateTableAsSelect, CreateTable, DeleteAction, DeleteFromTable, DescribeRelation, DropTable, Filter, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, RenameColumn, ReplaceTableAsSelect, SetTableProperties, ShowCreateTable, ShowTableProperties, ShowTables, SubqueryAlias, TableSpecBase, UnresolvedHint, UnresolvedTableSpec, UnresolvedWith, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, Transform => V2Transform}
import org.apache.spark.sql.execution.command.ExplainCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType, TimestampType}

/** SQL text front end over the graft table layer — the BI/notebook entry
  * path for GOVERNED tables, completing what `sqlOverViews` gives the raw
  * parquet surface. The reference serves its Iceberg tables to plain
  * `spark.sql` through the Iceberg catalog plugin (docker-compose.yml:
  * 58-81, spark-defaults.conf catalog wiring); this is that capability
  * re-expressed over [[graft.table.GraftCatalog]]:
  *
  * {{{
  *   GraftSql.sql(spark, cat, "SELECT * FROM graft.ns.tbl WHERE ...")
  *   GraftSql.sql(spark, cat, "SELECT count(*) FROM graft.ns.tbl VERSION AS OF 3")
  *   GraftSql.sql(spark, cat, "SELECT ... FROM graft.ns.tbl TIMESTAMP AS OF '2024-01-02 00:00:00'")
  *   GraftSql.sql(spark, cat, "INSERT INTO graft.ns.tbl SELECT ...")
  * }}}
  *
  * Architecture: parse with the session's OWN parser (the grammar already
  * understands time travel for any relation), then substitute every
  * `graft.*`-prefixed relation — wherever it appears: joins, subqueries,
  * CTEs, the INSERT source — with the table's analyzed merge-on-read
  * DataFrame plan at the requested snapshot, and hand the tree back to
  * the analyzer. This is exactly how temp-view expansion works inside
  * Spark, so self-joins deduplicate attribute ids, column pruning and
  * filter pushdown reach the snapshot's parquet scans, and EVERY read
  * goes through [[graft.table.GraftTable.read]] — deletion vectors,
  * equality/positional deletes, row filters and schema evolution apply
  * identically to SQL and Scala callers. (A DataSourceV2 TableCatalog
  * could resolve the NAME, but its read path would bypass the MoR
  * semantics — a raw file scan serves deleted rows. The plan-substitution
  * front end is the design that cannot drift from the Scala read path.)
  *
  * Scale: resolution cost is metadata-sized (one log fold per referenced
  * snapshot); the data-plane plan is the same one `read()` builds, so
  * everything the plan audit pins for table reads holds for SQL too.
  */
object GraftSql {

  /** Run one SQL statement. SELECT (with joins/subqueries/CTEs/time
    * travel) returns the query result; INSERT INTO runs eagerly and
    * returns a 1-row commit summary (table, rows_appended, new_version).
    * Relations resolve as `<prefix>.<namespace>.<table>` or
    * `<prefix>.<table>` (namespace "default").
    */
  def sql(spark: SparkSession, cat: GraftCatalog, text: String,
      prefix: String = "graft"): DataFrame = {
    SparkShims.parsePlan(spark, text) match {
      case ins: InsertIntoStatement =>
        val ident = ins.table match {
          case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
            u.multipartIdentifier
          case other => throw new IllegalArgumentException(
            s"INSERT target is not a $prefix.* table: $other")
        }
        require(ins.partitionSpec.isEmpty && ins.userSpecifiedCols.isEmpty &&
            !ins.ifPartitionNotExists,
          "only `INSERT [OVERWRITE] <table> <query>` is supported " +
            "(no PARTITION clause or column list)")
        val (ns, tbl) = splitIdent(ident, prefix)
        val t = cat.openTable(ns, tbl)
        // replay-safe ingest from SQL (r11 verdict #6): `INSERT INTO t
        // SELECT /*+ TXN('appId', version) */ ...` routes onto the table
        // layer's appendIdempotent — the Delta txnAppId/txnVersion
        // contract, so an ETL tool that crashes between writing and
        // recording its offset can replay the same statement without
        // double-appending. The hint is the one SQL surface Spark
        // reserves for out-of-band plan directives; it is stripped here
        // (Spark itself would warn-drop an unknown hint, silently losing
        // the idempotence the caller asked for).
        var txn: Option[(String, Long)] = None
        val queryNoHint = ins.query.transformDown {
          case h: UnresolvedHint if h.name.equalsIgnoreCase("TXN") =>
            require(txn.isEmpty, "at most one TXN hint per INSERT")
            txn = Some(h.parameters match {
              case Seq(Literal(a, StringType), Literal(v, _)) if v != null &&
                  (v.isInstanceOf[Int] || v.isInstanceOf[Long]) =>
                (a.toString, v.asInstanceOf[Number].longValue())
              case other => throw new IllegalArgumentException(
                "TXN hint takes ('appId', version): a string literal and " +
                  s"an integer literal; got: $other")
            })
            h.child
        }
        // append() conforms the batch to the table's current schema by
        // NAME (widening as needed) — SQL INSERT here is by-name, the
        // unambiguous contract for evolved schemas
        val src = SparkShims.ofRows(spark, substitute(spark, cat, queryNoHint, prefix))
        // the table's live layout, parsed all-or-nothing: a multi-
        // dimension layout with one unparseable dimension yields Nil,
        // never a partial spec acting at the wrong granularity. ONE
        // layout fold + ONE properties fold serve the whole statement.
        val layout = t.currentLayout
        val specs = layout.map(PartitionSpec.parseAll).getOrElse(Nil)
        val (wStats, wBlooms) = t.writeSkippingCols
        if (txn.isDefined) {
          require(!ins.overwrite,
            "TXN (idempotent) INSERT supports INSERT INTO only — an " +
              "idempotent dynamic-partition OVERWRITE replay would need " +
              "the overwritten state recorded, which the watermark is not")
          require(specs.isEmpty,
            "TXN INSERT into a partition-laid-out table is not supported " +
              "from SQL yet; use the Scala CatalogTxn.appendPartitioned " +
              "path for partitioned exactly-once ingest")
          val (app, ver) = txn.get
          // the no-op detection reads the watermark, not the head seq: a
          // concurrent writer on a DIFFERENT appId may advance the head
          // between the check and the call, and the contract (one live
          // committer per appId, Delta's) makes the watermark itself
          // stable for the duration of this statement
          val replayed = t.properties().get(s"txn.$app").exists(_.toLong >= ver)
          val seq = t.appendIdempotent(src, app, ver,
            statsCols = wStats, bloomCols = wBlooms)
          // a replayed (version ≤ watermark) call returns the CURRENT
          // head as a no-op: report rows_appended = 0, never the prior
          // commit's row count
          val n = if (replayed) 0L
            else t.snapshots.find(_.seq == seq).map(_.fileRows.sum).getOrElse(-1L)
          return spark.createDataFrame(
            java.util.List.of(Row(s"$ns.$tbl", n, seq)),
            StructType(Seq(StructField("table", StringType, nullable = false),
              StructField("rows_appended", LongType, nullable = false),
              StructField("new_version", LongType, nullable = false))))
        }
        val seq = if (ins.overwrite) {
          // INSERT OVERWRITE = DYNAMIC partition overwrite (the daily-
          // backfill op): the spec comes from the table's own layout, so
          // only partitions the batch touches are replaced — never the
          // whole table (Spark's dangerous non-dynamic default)
          require(specs.size == 1, if (layout.isEmpty)
            "INSERT OVERWRITE requires a partitioned table (dynamic " +
              "partition overwrite); this table has no partitioned layout"
          else "INSERT OVERWRITE supports single-dimension layouts; this " +
            s"table's layout is '${layout.get}'")
          t.overwritePartitions(src, specs.head,
            statsCols = wStats, bloomCols = wBlooms)
        } else if (specs.nonEmpty) {
          // INSERT INTO a partitioned table lands partition-laid-out
          // under the table's OWN spec (r11): a plain append would leave
          // every new file outside the partition grid — point probes
          // would stop pruning exactly on the freshest data, the slice a
          // 100 TB ingest queries most. write.stats-cols/write.bloom-cols
          // properties stamp per-file skipping metadata as declared.
          t.appendPartitioned(src, specs, wStats, wBlooms)
        } else t.append(src, statsCols = wStats, bloomCols = wBlooms)
        // rows_appended from the commit's OWN per-file row counts — a
        // driver-side count() would re-evaluate the source (two scans of
        // an arbitrary query, and a second answer if it's non-deterministic)
        val n = t.snapshots.find(_.seq == seq)
          .map(_.fileRows.sum).getOrElse(-1L)
        spark.createDataFrame(
          java.util.List.of(Row(s"$ns.$tbl", n, seq)),
          StructType(Seq(StructField("table", StringType, nullable = false),
            StructField("rows_appended", LongType, nullable = false),
            StructField("new_version", LongType, nullable = false))))
      case del: DeleteFromTable =>
        val (ns, tbl) = targetIdent(del.table, prefix, "DELETE")
        val t = cat.openTable(ns, tbl)
        val seq = deleteByPredicate(spark, t, del.condition)
        dmlSummary(spark, s"$ns.$tbl", "delete", seq)

      case up: UpdateTable =>
        val (ns, tbl) = targetIdent(up.table, prefix, "UPDATE")
        val keyPred = up.condition.map(splitConj).getOrElse(Nil) match {
          case Seq(EqualTo(a: UnresolvedAttribute, l: Literal)) => (a.name, lit2Scala(l))
          case Seq(EqualTo(l: Literal, a: UnresolvedAttribute)) => (a.name, lit2Scala(l))
          case other => throw new IllegalArgumentException(
            "UPDATE supports exactly `WHERE <col> = <literal>` (the table " +
              s"layer's copy-on-write updateWhereEq); got: $other")
        }
        val set = up.assignments.map {
          // UPDATE assignments evaluate over the TARGET row itself, so a
          // target-qualified reference is exactly right — strip it, and
          // refuse nothing
          case Assignment(a: UnresolvedAttribute, v) =>
            a.name -> expr(
              unqualified(v, strip = qualifiersOf(up.table), refuse = Set.empty).sql)
          case a => throw new IllegalArgumentException(s"unsupported SET target: $a")
        }.toMap
        val t = cat.openTable(ns, tbl)
        val seq = t.updateWhereEq(keyPred._1, keyPred._2, set)
        dmlSummary(spark, s"$ns.$tbl", "update", seq)

      case mg: MergeIntoTable =>
        val (ns, tbl) = targetIdent(mg.targetTable, prefix, "MERGE")
        require(mg.notMatchedBySourceActions.isEmpty,
          "WHEN NOT MATCHED BY SOURCE is not supported")
        // Clause conditions are handed to GraftTable.merge, which
        // evaluates them against the SOURCE row (the CDC-feed contract).
        // Standard SQL MERGE may also reference the TARGET's current
        // value in a matched condition (`WHEN MATCHED AND t.status =
        // 'expired' THEN DELETE`) — silently evaluating that on a
        // same-named SOURCE column would delete the wrong rows, so any
        // target-qualified attribute in a clause condition refuses
        // loudly instead (driver ADVICE r10).
        val tQuals = qualifiersOf(mg.targetTable)
        val sQuals = qualifiersOf(mg.sourceTable)
        def srcCond(c: Expression): String =
          unqualified(c, strip = sQuals, refuse = tQuals).sql
        // matched: UPDATE SET * (optionally preceded by a conditional
        // DELETE); not-matched: INSERT * — the upsert family the table
        // layer's merge() implements as ONE atomic mixed commit
        val deleteWhen = mg.matchedActions match {
          case Seq(UpdateStarAction(None)) => expr("false")
          case Seq(DeleteAction(Some(c)), UpdateStarAction(None)) => expr(srcCond(c))
          case Seq(DeleteAction(None)) if mg.notMatchedActions.nonEmpty => expr("true")
          case other => throw new IllegalArgumentException(
            "MERGE supports WHEN MATCHED THEN UPDATE SET * (optionally " +
              s"after WHEN MATCHED AND <cond> THEN DELETE); got: $other")
        }
        val insertWhen = mg.notMatchedActions match {
          case Seq(InsertStarAction(None)) => expr("true")
          case Seq(InsertStarAction(Some(c))) => expr(srcCond(c))
          case Seq() => expr("false")
          case other => throw new IllegalArgumentException(
            s"MERGE supports WHEN NOT MATCHED [AND <cond>] THEN INSERT *; got: $other")
        }
        val keyCols = splitConj(mg.mergeCondition).map {
          case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
              if a.nameParts.last == b.nameParts.last => a.nameParts.last
          case other => throw new IllegalArgumentException(
            "MERGE ON must be a conjunction of target.<k> = source.<k> " +
              s"same-name equi predicates; got: $other")
        }
        val src = SparkShims.ofRows(spark, substitute(spark, cat, mg.sourceTable, prefix))
        val t = cat.openTable(ns, tbl)
        val seq = t.merge(src, keyCols, deleteWhen = deleteWhen, insertWhen = insertWhen)
        dmlSummary(spark, s"$ns.$tbl", "merge", seq)

      case cta: CreateTableAsSelect =>
        createAs(spark, cat, cta.name, cta.partitioning, cta.query,
          cta.tableSpec, prefix, ifNotExists = cta.ignoreIfExists,
          replace = false)

      case ct: CreateTable =>
        // bare CREATE TABLE (cols): an EMPTY seed commit stamps the
        // declared schema (and the partition layout), so INSERT INTO
        // conforms by name from the first batch — the create-then-ingest
        // shape every streaming pipeline starts with
        require(ct.columns.forall(c => c.comment.isEmpty &&
            c.defaultValue.isEmpty && c.generationExpression.isEmpty &&
            c.identityColumnSpec.isEmpty),
          "CREATE TABLE supports plain `name TYPE` columns (defaults land " +
            "via ALTER TABLE ADD COLUMNS ... DEFAULT)")
        val empty = spark.createDataFrame(
          new java.util.ArrayList[Row](), ct.tableSchema)
        createAs(spark, cat, ct.name, ct.partitioning,
          empty.queryExecution.analyzed, ct.tableSpec, prefix,
          ifNotExists = ct.ignoreIfExists, replace = false, bare = true)

      case rta: ReplaceTableAsSelect =>
        createAs(spark, cat, rta.name, rta.partitioning, rta.query,
          rta.tableSpec, prefix, ifNotExists = false, replace = true)

      case dt: DropTable =>
        val (ns, tbl) = identParts(dt.child, prefix, "DROP TABLE")
        val dropped = cat.dropTable(ns, tbl)
        if (!dropped && !dt.ifExists) throw new IllegalArgumentException(
          s"table $ns.$tbl does not exist (use DROP TABLE IF EXISTS)")
        dmlSummary(spark, s"$ns.$tbl", if (dropped) "drop" else "drop_noop", -1L)

      case cn: CreateNamespace =>
        val ns = cn.name match {
          case u: UnresolvedNamespace if u.multipartIdentifier.length == 2 &&
              u.multipartIdentifier.head == prefix => u.multipartIdentifier(1)
          case other => throw new IllegalArgumentException(
            s"CREATE NAMESPACE target is not $prefix.<ns>: $other")
        }
        cat.createNamespace(ns) // idempotent, like the REST catalog's 409-tolerance
        dmlSummary(spark, ns, "create_namespace", -1L)

      case ac: AddColumns =>
        val (ns, tbl) = targetIdent(ac.table, prefix, "ALTER TABLE")
        val t = cat.openTable(ns, tbl)
        val seqs = ac.columnsToAdd.map { c =>
          require(c.path.isEmpty && c.comment.isEmpty && c.position.isEmpty,
            "ADD COLUMNS supports top-level `<name> <type> [DEFAULT <lit>]` " +
              "only (no nested paths, comments, or position clauses)")
          t.addColumn(c.colName, c.dataType, c.default.map(_.originalSQL))
        }
        dmlSummary(spark, s"$ns.$tbl", "add_columns", seqs.last)

      case rc: RenameColumn =>
        val (ns, tbl) = targetIdent(rc.table, prefix, "ALTER TABLE")
        require(rc.column.name.length == 1,
          s"RENAME COLUMN supports top-level columns only: ${rc.column.name}")
        val seq = cat.openTable(ns, tbl).renameColumn(rc.column.name.head, rc.newName)
        dmlSummary(spark, s"$ns.$tbl", "rename_column", seq)

      case alc: AlterColumns =>
        val (ns, tbl) = targetIdent(alc.table, prefix, "ALTER TABLE")
        val t = cat.openTable(ns, tbl)
        val seqs = alc.specs.map { sp =>
          require(sp.column.name.length == 1 && sp.newDataType.isDefined &&
              sp.newNullability.isEmpty && sp.newComment.isEmpty &&
              sp.newPosition.isEmpty,
            "ALTER COLUMN supports `<top-level col> TYPE <wider type>` only " +
              "(the table layer's widenColumn — id-stable promotion)")
          t.widenColumn(sp.column.name.head, sp.newDataType.get)
        }
        dmlSummary(spark, s"$ns.$tbl", "alter_column_type", seqs.last)

      case sp: SetTableProperties =>
        val (ns, tbl) = targetIdent(sp.table, prefix, "ALTER TABLE")
        val seq = cat.openTable(ns, tbl).setProperties(sp.properties)
        dmlSummary(spark, s"$ns.$tbl", "set_properties", seq)

      // ── catalog inspection (the notebook/BI discovery surface) ──
      case st: ShowTables =>
        val nss = st.namespace match {
          case u: UnresolvedNamespace if u.multipartIdentifier == Seq(prefix) =>
            cat.namespaces // SHOW TABLES IN graft → whole warehouse
          case u: UnresolvedNamespace if u.multipartIdentifier.length == 2 &&
              u.multipartIdentifier.head == prefix =>
            Seq(u.multipartIdentifier(1))
          case other => throw new IllegalArgumentException(
            s"SHOW TABLES supports IN $prefix[.<ns>]: $other")
        }
        val rx = st.pattern.map(p =>
          ("(?i)^(" + p.replace("*", ".*").replace("|", ")|(") + ")$").r)
        val rows = for {
          ns <- nss
          t <- cat.listTables(ns)
          if rx.forall(_.matches(t))
        } yield Row(ns, t, false)
        spark.createDataFrame(rows.asJava,
          StructType(Seq(StructField("namespace", StringType, nullable = false),
            StructField("tableName", StringType, nullable = false),
            StructField("isTemporary", BooleanType, nullable = false))))

      case d: DescribeRelation =>
        require(d.partitionSpec.isEmpty, "DESCRIBE ... PARTITION is not supported")
        val (ns, tbl) = targetIdent(d.relation, prefix, "DESCRIBE")
        val t = cat.openTable(ns, tbl)
        val cols = t.schemaAt().map(_.fields.toSeq).getOrElse(Nil)
          .map(f => Row(f.name, f.dataType.catalogString,
            if (f.nullable) null else "not null"))
        val extra = if (!d.isExtended) Nil else {
          Row("# Partitioning", t.currentLayout.getOrElse("none"), null) +:
            t.properties().toSeq.sortBy(_._1).map { case (k, v) =>
              Row(s"# Property: $k", v, null)
            }
        }
        spark.createDataFrame((cols ++ extra).asJava,
          StructType(Seq(StructField("col_name", StringType, nullable = false),
            StructField("data_type", StringType, nullable = false),
            StructField("comment", StringType, nullable = true))))

      case sc: ShowCreateTable =>
        val (ns, tbl) = targetIdent(sc.child, prefix, "SHOW CREATE TABLE")
        val t = cat.openTable(ns, tbl)
        val cols = t.schemaAt().map(_.fields.toSeq).getOrElse(Nil)
          .map(f => s"  ${f.name} ${f.dataType.sql}").mkString(",\n")
        // the layout renders back in CTAS transform syntax: PARTITIONED
        // BY / TBLPROPERTIES clauses paste verbatim into this front
        // end's own `CREATE TABLE ... AS SELECT` (the column list is
        // informational — graft tables take their schema from the seed)
        def sqlTransform(p: PartitionSpec): String = p.transform match {
          case Transform.Identity => p.col
          case Transform.Bucket(n) => s"bucket($n, ${p.col})"
          case Transform.EpochDay => s"days(${p.col})"
          case Transform.Truncate(w) => s"truncate($w, ${p.col})"
          case Transform.TruncateStr(w) => s"truncate($w, ${p.col})"
        }
        val partLine = t.currentSpecs match {
          case Nil => ""
          case specs => specs.map(sqlTransform)
            .mkString("\nPARTITIONED BY (", ", ", ")")
        }
        val propLine = t.properties().toSeq.sortBy(_._1) match {
          case Nil => ""
          case ps => ps.map { case (k, v) => s"'$k' = '$v'" }
            .mkString("\nTBLPROPERTIES (", ", ", ")")
        }
        spark.createDataFrame(
          java.util.List.of(Row(
            s"CREATE TABLE $prefix.$ns.$tbl (\n$cols)$partLine$propLine")),
          StructType(Seq(StructField("createtab_stmt", StringType, nullable = false))))

      case sp: ShowTableProperties =>
        val (ns, tbl) = targetIdent(sp.table, prefix, "SHOW TBLPROPERTIES")
        val props = cat.openTable(ns, tbl).properties()
        val rows = sp.propertyKey match {
          case Some(k) => Seq(Row(k, props.getOrElse(k,
            throw new IllegalArgumentException(
              s"table $ns.$tbl has no property '$k'"))))
          case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
        }
        spark.createDataFrame(rows.asJava,
          StructType(Seq(StructField("key", StringType, nullable = false),
            StructField("value", StringType, nullable = false))))

      case c: Call =>
        val nameParts = c.procedure match {
          case up: UnresolvedProcedure => up.nameParts
          case other => throw new IllegalArgumentException(
            s"unsupported CALL target: $other")
        }
        require(nameParts.length == 3 && nameParts.head == prefix &&
            nameParts(1) == "system",
          s"CALL supports $prefix.system.<procedure>(...) only, got: " +
            nameParts.mkString("."))
        callProcedure(spark, cat, nameParts(2), c.args)

      // EXPLAIN [EXTENDED|FORMATTED|CODEGEN|COST] <query> over graft
      // relations (r11 verdict #2): a notebook user tuning a slow
      // governed query needs to SEE whether pushdown and partition
      // pruning reached the substituted snapshot scan without dropping
      // to Scala. The session parser already wraps the statement in
      // ExplainCommand; substitute the inner plan exactly like a SELECT
      // and render the requested mode — the text is the plan the query
      // WOULD run, same analyzer/optimizer pipeline, zero data I/O.
      case ec: ExplainCommand =>
        ec.logicalPlan match {
          case _: InsertIntoStatement | _: DeleteFromTable | _: UpdateTable |
              _: MergeIntoTable | _: CreateTableAsSelect | _: CreateTable |
              _: ReplaceTableAsSelect | _: DropTable | _: Call =>
            throw new IllegalArgumentException(
              "EXPLAIN supports read queries over graft relations; DML/DDL " +
                "statements execute eagerly here and have no lazy plan to show")
          case inner =>
            // collect per-relation scan notes DURING substitution: the
            // Spark plan text cannot show graft's manifest-level file
            // pruning (the pruned plan simply lists fewer files), so
            // EXPLAIN appends a Graft Scans section saying, per governed
            // relation, how many of the snapshot's data files the probe
            // actually opens — the number an operator tunes against
            val notes = new scala.collection.mutable.ArrayBuffer[String]()
            val df = SparkShims.ofRows(spark,
              substitute(spark, cat, inner, prefix, Some(notes)))
            val text = df.queryExecution.explainString(ec.mode) +
              (if (notes.isEmpty) ""
               else notes.distinct.mkString("\n== Graft Scans ==\n", "\n", "\n"))
            spark.createDataFrame(
              java.util.List.of(Row(text)),
              StructType(Seq(StructField("plan", StringType, nullable = false))))
        }

      case plan =>
        SparkShims.ofRows(spark, substitute(spark, cat, plan, prefix))
    }
  }

  /** Parameter order of each maintenance procedure — positional args
    * fill this order; named args (`k => v`) may come in any order and
    * mix with positionals, Spark's own procedure-call convention.
    */
  private val ProcParams: Map[String, Seq[String]] = Map(
    "rewrite_data_files" -> Seq("table", "strategy", "target_bytes",
      "sort_col", "num_files", "stats_cols", "bloom_cols"),
    "expire_snapshots" -> Seq("table", "orphan_older_than_ms"),
    "remove_orphan_files" -> Seq("table", "older_than_ms"),
    "rewrite_position_deletes" -> Seq("table"),
    "compute_stats" -> Seq("table", "cols"))

  /** The Iceberg `CALL catalog.system.<proc>` maintenance surface
    * (reference capability: the compose Spark ships Iceberg's stored
    * procedures next to its SQL — rewrite_data_files, expire_snapshots,
    * remove_orphan_files), mapped 1:1 onto the table layer's own
    * maintenance ops with the SAME refusal semantics — an operator in a
    * notebook can now compact, expire and vacuum without leaving SQL:
    *
    * {{{
    *   CALL graft.system.rewrite_data_files('ns.tbl')                     -- binpack small files
    *   CALL graft.system.rewrite_data_files('ns.tbl', strategy => 'sort',
    *        sort_col => 'ts', num_files => 8)
    *   CALL graft.system.rewrite_data_files('ns.tbl', strategy => 'zorder',
    *        sort_col => 'x,y', num_files => 16)
    *   CALL graft.system.expire_snapshots('ns.tbl')
    *   CALL graft.system.remove_orphan_files('ns.tbl', older_than_ms => 0)
    *   CALL graft.system.rewrite_position_deletes('ns.tbl')
    *   CALL graft.system.compute_stats('ns.tbl', cols => 'a,b')
    * }}}
    *
    * Scale: each call is ONE table-layer maintenance op — binpack adopts
    * healthy files by path and rewrites only the small tail, expire is
    * metadata + orphan unlink, compute_stats scans only the named
    * columns. Nothing here adds driver-side row work.
    */
  private def callProcedure(spark: SparkSession, cat: GraftCatalog,
      proc: String, args: Seq[Expression]): DataFrame = {
    val params = ProcParams.getOrElse(proc, throw new IllegalArgumentException(
      s"unknown procedure '$proc' (supported: ${ProcParams.keys.toSeq.sorted.mkString(", ")})"))
    // positional args bind in declared order and must precede every
    // named arg — accepting a positional AFTER a named one would bind it
    // by absolute index to the wrong parameter (r11 review); duplicate
    // bindings refuse rather than last-write-wins
    var sawNamed = false
    val bound: Seq[(String, Any)] = args.zipWithIndex.map {
      case (NamedArgumentExpression(k, v: Literal), _) =>
        sawNamed = true
        require(params.contains(k),
          s"$proc has no parameter '$k' (parameters: ${params.mkString(", ")})")
        k -> lit2Scala(v)
      case (l: Literal, i) =>
        require(!sawNamed,
          s"$proc: positional argument at position ${i + 1} follows a " +
            "named argument; name it instead")
        require(i < params.size, s"$proc takes at most ${params.size} arguments")
        params(i) -> lit2Scala(l)
      case (other, _) => throw new IllegalArgumentException(
        s"CALL arguments must be literals (positional or named): $other")
    }
    require(bound.map(_._1).distinct.size == bound.size,
      s"$proc: a parameter is bound more than once: " +
        bound.map(_._1).diff(bound.map(_._1).distinct).mkString(", "))
    val kv: Map[String, Any] = bound.toMap
    def str(k: String): Option[String] = kv.get(k).map(String.valueOf)
    def num(k: String): Option[Long] = kv.get(k).map {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$proc argument $k must be numeric, got: $other")
    }
    def csv(k: String): Seq[String] =
      str(k).toSeq.flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    val (ns, tbl) = str("table").getOrElse(throw new IllegalArgumentException(
      s"$proc requires a table argument: CALL ... ('ns.tbl')")) match {
      case s if s.contains('.') =>
        val parts = s.split('.'); require(parts.length == 2,
          s"table must be '<ns>.<table>' or '<table>': $s")
        (parts(0), parts(1))
      case s => ("default", s)
    }
    val t = cat.openTable(ns, tbl)
    val result: Long = proc match {
      case "rewrite_data_files" => str("strategy").getOrElse("binpack") match {
        case "binpack" =>
          // a PARTITIONED table rewrites under its own spec (Iceberg's
          // rewrite_data_files compacts within partitions): the replace
          // RECORDS the layout, so partition pruning survives the
          // rewrite — compactSmall's flat replace would silently drop
          // it. parseAll is all-or-nothing; an unparseable or multi-dim
          // layout falls back to the flat binpack, whose adopted files
          // still prune by their per-file stats.
          val layout = t.currentSpecs
          if (layout.size == 1) {
            // the layout-preserving rewrite takes neither target_bytes
            // nor bloom_cols — refusing beats silently dropping an
            // argument the operator believes took effect (r11 review)
            require(num("target_bytes").isEmpty && csv("bloom_cols").isEmpty,
              "rewrite_data_files on a partitioned table rewrites under " +
                "the table's own spec and supports only stats_cols; omit " +
                "target_bytes/bloom_cols")
            t.compactPartitioned(layout.head, statsCols = csv("stats_cols"))
          } else t.compactSmall(num("target_bytes").getOrElse(128L * 1024 * 1024),
            statsCols = csv("stats_cols"), bloomCols = csv("bloom_cols"))
        case "sort" =>
          val sc = str("sort_col").getOrElse(throw new IllegalArgumentException(
            "strategy 'sort' requires sort_col"))
          t.compactSorted(sc, num("num_files").getOrElse(8L).toInt)
        case "zorder" =>
          t.compactZOrder(csv("sort_col"), num("num_files").getOrElse(16L).toInt)
        case other => throw new IllegalArgumentException(
          s"unknown rewrite strategy '$other' (binpack, sort, zorder)")
      }
      case "expire_snapshots" =>
        // NOT Iceberg's age-based snapshot cutoff: graft retention is
        // ref-aware (tags pin their history; untagged history below
        // head expires), and the argument gates only the orphan FILE
        // sweep — named orphan_older_than_ms to say so. The SQL surface
        // defaults to the 3h in-flight-writer grace period (a notebook
        // operator usually runs BESIDE live ingest); provable immediate
        // reclamation (the GDPR-erasure contract) passes an explicit 0.
        t.expireSnapshots(num("orphan_older_than_ms")
          .getOrElse(3L * 3600 * 1000))
      case "remove_orphan_files" =>
        t.removeOrphanFiles(num("older_than_ms")
          .getOrElse(3L * 3600 * 1000)).toLong
      case "rewrite_position_deletes" => t.rewritePositionDeletes()
      case "compute_stats" => t.recomputeStats(csv("cols"))
    }
    spark.createDataFrame(
      java.util.List.of(Row(s"$ns.$tbl", proc, result)),
      StructType(Seq(StructField("table", StringType, nullable = false),
        StructField("procedure", StringType, nullable = false),
        StructField("result", LongType, nullable = false))))
  }

  /** CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT: resolve the query
    * (which may itself read graft tables), create-or-replace through the
    * catalog, land the result as the seed commit. PARTITIONED BY maps
    * onto the table layer's own transforms — identity, bucket(n, col),
    * days(col), truncate(w, col) — so a CTAS lays the table out exactly
    * like the Scala appendPartitioned path would.
    */
  private def createAs(spark: SparkSession, cat: GraftCatalog,
      nameP: LogicalPlan, partitioning: Seq[V2Transform], query: LogicalPlan,
      spec: TableSpecBase, prefix: String, ifNotExists: Boolean,
      replace: Boolean, bare: Boolean = false): DataFrame = {
    val (ns, tbl) = identParts(nameP, prefix, "CREATE TABLE")
    spec match {
      case u: UnresolvedTableSpec =>
        require(u.location.isEmpty && u.provider.isEmpty && u.serde.isEmpty &&
            !u.external && u.constraints.isEmpty,
          "CREATE TABLE supports only TBLPROPERTIES and PARTITIONED BY " +
            "clauses (no LOCATION/USING/SERDE/EXTERNAL/CONSTRAINT)")
      case _ => ()
    }
    if (!replace && cat.tableExists(ns, tbl)) {
      if (ifNotExists) return dmlSummary(spark, s"$ns.$tbl", "create_noop", -1L)
      throw new IllegalArgumentException(
        s"table $ns.$tbl already exists (use IF NOT EXISTS or REPLACE TABLE)")
    }
    val df = SparkShims.ofRows(spark, substitute(spark, cat, query, prefix))
    val specs = partitioning.map(v2ToGraftTransform(_, df.schema))
    cat.createNamespace(ns)
    // REPLACE over an existing table must not destroy-then-execute: the
    // seed query is lazy, so dropping first would leave the table gone if
    // the query fails at runtime — and `REPLACE t AS SELECT ... FROM t`
    // would read its own just-deleted files. Build the replacement in a
    // STAGING slot beside the old table (Iceberg RTAS keeps the old
    // state until the new commit lands), then swap with one atomic
    // directory rename; any failure before the swap drops only the
    // staging table (driver ADVICE r10).
    val replacing = replace && cat.tableExists(ns, tbl)
    // leading underscores are reserved for catalog internals, so the
    // staging/aside slots are ordinary (briefly listable) table names
    val stamp = java.util.UUID.randomUUID().toString.replace("-", "")
    val buildName = if (replacing) s"rtas_stage_${tbl}_$stamp" else tbl
    // set when the swap could not be rolled back: the replacement under
    // buildName may then be the only complete copy — never delete it
    var keepBuildOnFailure = false
    val seq =
      try {
        val t = cat.createTable(ns, buildName)
        spec match {
          case u: UnresolvedTableSpec if u.properties.nonEmpty =>
            t.setProperties(u.properties)
          case _ => ()
        }
        // TBLPROPERTIES landed above, so a declared write.stats-cols /
        // write.bloom-cols applies to the seed commit itself
        val (wStats, wBlooms) = t.writeSkippingCols
        val s =
          if (specs.isEmpty) t.append(df, statsCols = wStats, bloomCols = wBlooms)
          else t.appendPartitioned(df, specs, wStats, wBlooms)
        if (replacing) {
          // swap = rename-old-ASIDE → rename-new-in → drop-old: at no
          // point is the replacement the only copy while a destructive
          // step can still fail (r11 review — the previous drop-then-
          // rename could lose BOTH copies if the rename threw and the
          // cleanup dropped the staging table). Every rename is one
          // atomic directory move; a failure of the second restores the
          // old table from the aside slot before rethrowing. Residual
          // window: a hard kill BETWEEN the renames leaves the table
          // recoverable-by-rename under the aside name (never deleted).
          val aside = s"rtas_old_${tbl}_$stamp"
          cat.renameTable(ns, tbl, aside)
          try cat.renameTable(ns, buildName, tbl)
          catch {
            case e: Throwable =>
              // restore the old table; if even the restore fails, BOTH
              // copies must survive under their slot names for manual
              // recovery — deleting the finished replacement here would
              // destroy the only complete build (r11 review)
              try cat.renameTable(ns, aside, tbl)
              catch {
                case scala.util.control.NonFatal(_) => keepBuildOnFailure = true
              }
              throw e
          }
          // old copy retires last; a failure here leaves debris under
          // the aside name but the swapped table is live and complete
          cat.dropTable(ns, aside)
        }
        s
      } catch {
        case e: Throwable =>
          // drop whatever THIS statement created and can safely retire:
          // the staging build on pre-swap REPLACE failures (after a
          // successful swap buildName no longer resolves and this
          // no-ops), or the half-created target of a plain CREATE whose
          // seed query failed — leaving it would make a retry refuse
          // with "already exists" on an empty table (r11 review). The
          // existence checks above guarantee a !replacing target was
          // created by this very call.
          if (!keepBuildOnFailure) try cat.dropTable(ns, buildName) catch {
            case scala.util.control.NonFatal(_) => ()
          }
          throw e
      }
    dmlSummary(spark, s"$ns.$tbl",
      if (replace) "replace_as_select"
      else if (bare) "create" else "create_as_select", seq)
  }

  /** map a connector (SQL-surface) partition transform to the table
    * layer's transform of the same semantics; unknown transforms refuse.
    * Identity on a STRING column maps to the string truncate at width
    * 255 — the partition value is the (almost always whole) prefix, a
    * COARSER grouping that prunes correctly for equality and range
    * probes (Iceberg's own identity-vs-truncate relationship).
    */
  private def v2ToGraftTransform(t: V2Transform,
      schema: StructType): PartitionSpec = {
    def refCol: String = {
      val refs = t.references()
      require(refs.length == 1 && refs(0).fieldNames().length == 1,
        s"partition transform must reference one top-level column: $t")
      refs(0).fieldNames()(0)
    }
    def isString(c: String): Boolean =
      schema.fields.exists(f => f.name == c && f.dataType == StringType)
    def intArg: Int = t.arguments().collectFirst {
      case l: V2Literal[_] => l.value() match {
        case i: java.lang.Integer => i.intValue()
        case l2: java.lang.Long => l2.intValue()
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"transform ${t.name()} needs an integer argument: $t"))
    t.name() match {
      case "identity" if isString(refCol) =>
        PartitionSpec(refCol, Transform.TruncateStr(255))
      case "identity" => PartitionSpec(refCol, Transform.Identity)
      case "bucket" => PartitionSpec(refCol, Transform.Bucket(intArg))
      case "days" => PartitionSpec(refCol, Transform.EpochDay)
      case "truncate" if isString(refCol) =>
        PartitionSpec(refCol, Transform.TruncateStr(intArg))
      case "truncate" => PartitionSpec(refCol, Transform.Truncate(intArg.toLong))
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform $other (identity, bucket, days, " +
          "truncate map onto the table layer's transforms)")
    }
  }

  private def identParts(p: LogicalPlan, prefix: String,
      stmt: String): (String, String) = p match {
    case u: UnresolvedIdentifier if isGraft(u.nameParts, prefix) =>
      splitIdent(u.nameParts, prefix)
    case other => throw new IllegalArgumentException(
      s"$stmt target is not a $prefix.* table: $other")
  }

  /** DELETE WHERE routing onto the table layer's native delete shapes:
    * equality conjunction → one MoR equality-delete commit (zero data
    * I/O); single-column IN → multi-key equality delete; closed numeric
    * range → stats-pruned deleteWhereRange (aligned files drop
    * metadata-only). Anything else fails loudly — a silent full-table
    * rewrite is never the right surprise at 100 TB.
    */
  private def deleteByPredicate(spark: SparkSession, t: graft.table.GraftTable,
      cond: Expression): Long = {
    val conj = splitConj(cond)
    val eqs = conj.collect {
      case EqualTo(a: UnresolvedAttribute, l: Literal) => (a.name, l)
      case EqualTo(l: Literal, a: UnresolvedAttribute) => (a.name, l)
    }
    val ins = conj.collect {
      case In(a: UnresolvedAttribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        (a.name, vs.map(v => lit2Scala(v.asInstanceOf[Literal])))
    }
    // flatMap keeps the BETWEEN match total: a non-literal bound falls
    // through to None and the final unsupported-DELETE refusal, never a
    // MatchError (driver ADVICE r10)
    val los = conj.flatMap {
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => Some((a.name, lit2Scala(l)))
      case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) => Some((a.name, lit2Scala(l)))
      case Between(a: UnresolvedAttribute, lo: Literal, _, _) => Some((a.name, lit2Scala(lo)))
      // the parser emits BETWEEN as an unresolved function call
      case f: UnresolvedFunction if f.nameParts == Seq("between") =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute, lo: Literal, _: Literal) =>
            Some((a.name, lit2Scala(lo)))
          case _ => None
        }
      case _ => None
    }
    val his = conj.flatMap {
      case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) => Some((a.name, lit2Scala(l)))
      case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => Some((a.name, lit2Scala(l)))
      case Between(a: UnresolvedAttribute, _, hi: Literal, _) => Some((a.name, lit2Scala(hi)))
      case f: UnresolvedFunction if f.nameParts == Seq("between") =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute, _: Literal, hi: Literal) =>
            Some((a.name, lit2Scala(hi)))
          case _ => None
        }
      case _ => None
    }
    (eqs, ins, los, his) match {
      case (es, Seq(), Seq(), Seq()) if es.nonEmpty && es.size == conj.size &&
          es.map(_._1).distinct.size == es.size =>
        val keys = spark.createDataFrame(
          java.util.List.of(Row(es.map(e => lit2Scala(e._2)): _*)),
          StructType(es.map(e => StructField(e._1, e._2.dataType))))
        t.delete(keys, es.map(_._1))
      case (Seq(), Seq((c, vs)), Seq(), Seq()) if conj.size == 1 =>
        val dt = conj.head.asInstanceOf[In].list.head.dataType
        val keys = spark.createDataFrame(
          vs.map(v => Row(v)).asJava, StructType(Seq(StructField(c, dt))))
        t.delete(keys, Seq(c))
      case (Seq(), Seq(), Seq((cl, lo)), Seq((ch, hi)))
          if cl == ch && conj.size <= 2 => // one Between or a >=/<= pair
        t.deleteWhereRange(cl, lo, hi).seq
      case _ => throw new IllegalArgumentException(
        "DELETE supports `<col> = <lit> [AND ...]` (equality delete), " +
          "`<col> IN (<lits>)`, or `<col> BETWEEN <lo> AND <hi>`; got: " + cond.sql)
    }
  }

  private def dmlSummary(spark: SparkSession, table: String, op: String,
      seq: Long): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(table, op, seq)),
      StructType(Seq(StructField("table", StringType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("new_version", LongType, nullable = false))))

  private def targetIdent(table: LogicalPlan, prefix: String,
      stmt: String): (String, String) = table match {
    case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
      splitIdent(u.multipartIdentifier, prefix)
    case u: UnresolvedTable if isGraft(u.multipartIdentifier, prefix) =>
      splitIdent(u.multipartIdentifier, prefix) // ALTER TABLE targets
    case u: UnresolvedTableOrView if isGraft(u.multipartIdentifier, prefix) =>
      splitIdent(u.multipartIdentifier, prefix) // DESCRIBE/SHOW targets
    // the parser wraps DML targets in an alias node sometimes (MERGE ... AS t)
    case p if p.children.size == 1 => targetIdent(p.children.head, prefix, stmt)
    case other => throw new IllegalArgumentException(
      s"$stmt target is not a $prefix.* table: $other")
  }

  private def splitConj(c: Expression): Seq[Expression] = c match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case e => Seq(e)
  }

  /** All the ways SQL text may qualify a column of `rel`: its alias when
    * aliased (`... AS s` → `s.col`), or any suffix of the relation name
    * when bare (`graft.ns.t` → `t.col`, `ns.t.col`, `graft.ns.t.col`).
    */
  private def qualifiersOf(rel: LogicalPlan): Set[Seq[String]] = rel match {
    case sa: SubqueryAlias => Set(Seq(sa.alias))
    case u: UnresolvedRelation =>
      u.multipartIdentifier.tails.filter(_.nonEmpty).toSet
    case p if p.children.size == 1 => qualifiersOf(p.children.head)
    case _ => Set.empty
  }

  /** Strip `strip`-qualified attributes down to their column (+ nested
    * field) path — `s.col` → `col`, `s.meta.flag` → `meta.flag` — and
    * REFUSE `refuse`-qualified ones. For MERGE clause conditions, strip
    * = source, refuse = target: the table layer evaluates the condition
    * on the source row only, and silently reading a same-named source
    * column where SQL semantics say "target's current value" is
    * wrong-row DML. Prefix matching (not exact-init equality) so nested
    * target references like `t.meta.flag` cannot slip past the refusal
    * (r11 review). Bare or foreign-qualified names pass through for the
    * analyzer to judge.
    */
  private def unqualified(e: Expression, strip: Set[Seq[String]],
      refuse: Set[Seq[String]]): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length > 1 =>
      val parts = a.nameParts
      def prefixOf(quals: Set[Seq[String]]): Option[Seq[String]] =
        quals.filter(q => parts.length > q.length && parts.startsWith(q))
          .toSeq.sortBy(-_.length).headOption
      prefixOf(strip) match {
        case Some(q) => UnresolvedAttribute(parts.drop(q.length))
        case None if prefixOf(refuse).isDefined =>
          throw new IllegalArgumentException(
            s"MERGE clause condition references the TARGET (${a.name}): " +
              "clause conditions are evaluated against the source row; " +
              "rewrite the condition over source columns, or pre-join the " +
              "target state into the source query")
        case None => a
      }
  }

  private def lit2Scala(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  private implicit class JavaListOps[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val out = new java.util.ArrayList[A](s.size)
      s.foreach(out.add)
      out
    }
  }

  /** Replace every graft relation in the tree (and in subquery
    * expressions) with its snapshot's analyzed read plan. transformDown
    * so a RelationTimeTravel parent claims its child UnresolvedRelation
    * before a bottom-up pass could rewrite the child to a head read —
    * and so a Filter directly over a relation claims it first for the
    * predicate-pruned read (below).
    *
    * `notes` (EXPLAIN only) collects one line per governed scan saying
    * how many of the snapshot's data files the plan opens.
    */
  private def substitute(spark: SparkSession, cat: GraftCatalog,
      plan: LogicalPlan, prefix: String,
      notes: Option[scala.collection.mutable.ArrayBuffer[String]] = None): LogicalPlan = {
    val relsDone = plan.transformDown {
      // CTE definitions are NOT in `children` (UnresolvedWith carries
      // them beside its child), so a naive tree walk misses a graft
      // relation inside WITH — substitute each definition explicitly
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, sa, maxRec) =>
          (n, sa.copy(child = substitute(spark, cat, sa.child, prefix, notes)), maxRec)
        })
      // WHERE directly over one graft relation: route literal equality /
      // range conjuncts through the table layer's manifest-level file
      // pruning (readEq/readRange — the hidden-partitioning + per-file-
      // stats path), so a SQL point probe opens only the matching files
      // instead of every live file. Parquet row-group pushdown still
      // applies on the survivors; the original Filter stays in the tree,
      // so an over-eager prune can never change results — pruning only
      // removes files whose recorded stats PROVE they cannot match.
      case f: Filter =>
        val (rel, rebuild): (Option[UnresolvedRelation], LogicalPlan => LogicalPlan) =
          f.child match {
            case u: UnresolvedRelation => (Some(u), identity[LogicalPlan])
            case sa: SubqueryAlias => sa.child match {
              case u: UnresolvedRelation => (Some(u), p => sa.copy(child = p))
              case _ => (None, identity[LogicalPlan])
            }
            case _ => (None, identity[LogicalPlan])
          }
        rel match {
          case Some(u) if isGraft(u.multipartIdentifier, prefix) &&
              u.multipartIdentifier.length <= 3 =>
            val (ns, tbl) = splitIdent(u.multipartIdentifier, prefix)
            val pruned = sniffedRead(spark, cat.openTable(ns, tbl),
              s"$prefix.$ns.$tbl", f.condition, notes)
            pruned match {
              case Some(p) => f.copy(child = rebuild(p))
              case None => f // no usable conjunct: the relation case below runs
            }
          case _ => f
        }
      case tt: RelationTimeTravel => tt.relation match {
        case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
          readPlan(spark, cat, u.multipartIdentifier, prefix,
            tt.timestamp, tt.version)
        case other => tt // someone else's time travel — leave it alone
      }
      case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
        val p = readPlan(spark, cat, u.multipartIdentifier, prefix, None, None)
        notes.foreach { ns =>
          if (u.multipartIdentifier.length <= 3) {
            val (n, t) = splitIdent(u.multipartIdentifier, prefix)
            val total = cat.openTable(n, t).commitLog.state()._1.size
            ns += s"$prefix.$n.$t: full snapshot scan ($total data files)"
          }
        }
        p
    }
    relsDone.transformAllExpressions {
      case se: SubqueryExpression =>
        se.withNewPlan(substitute(spark, cat, se.plan, prefix, notes))
    }
  }

  /** Sniff a parsed WHERE (sitting directly over one graft relation) for
    * the table layer's native prune shapes, and return the PRUNED read
    * plan when one applies: `col = <lit>` → readEq (per-file stats,
    * blooms, and every partition dimension incl. bucket), closed or open
    * numeric range → readRange, string range → readRangeStr (hidden
    * partitioning: the caller names only the source column). First
    * usable conjunct wins — the remaining conjuncts still filter, they
    * just don't prune. Columns are matched by EXACT name against the
    * snapshot schema; a miss (or a non-literal) simply falls back to the
    * full snapshot scan. At 100 TB this is the difference between a SQL
    * point probe opening 3 files and opening 300,000.
    */
  private def sniffedRead(spark: SparkSession, t: graft.table.GraftTable,
      relName: String, cond: Expression,
      notes: Option[scala.collection.mutable.ArrayBuffer[String]]): Option[LogicalPlan] = {
    val fields: Set[String] =
      t.schemaAt().map(_.fields.map(_.name).toSet).getOrElse(Set.empty)
    def colOf(a: UnresolvedAttribute): Option[String] =
      Some(a.nameParts.last).filter(fields.contains)
    // prune-safe literal kinds: numeric + string match the stats/
    // partition-value renderings the write side records; anything else
    // (timestamps, intervals, binary) falls back to the unpruned scan
    def eqLit(l: Literal): Option[Any] = lit2Scala(l) match {
      case v: Int => Some(v)
      case v: Long => Some(v)
      case v: String => Some(v)
      case v: java.math.BigDecimal => Some(BigDecimal(v))
      case _ => None
    }
    def numLit(l: Literal): Option[BigDecimal] = lit2Scala(l) match {
      case v: Int => Some(BigDecimal(v))
      case v: Long => Some(BigDecimal(v))
      case v: java.math.BigDecimal => Some(BigDecimal(v))
      case _ => None
    }
    def strLit(l: Literal): Option[String] = lit2Scala(l) match {
      case v: String => Some(v)
      case _ => None
    }
    val conj = splitConj(cond)
    def note(col: String, opened: Int): Unit = notes.foreach { ns =>
      val total = t.commitLog.state()._1.size
      ns += s"$relName: probe on '$col' prunes to $opened of $total data files " +
        "(per-file stats + partition values + blooms)"
    }
    // 1. equality probe — the strongest prune (stats + bucket + bloom)
    val eq = conj.iterator.flatMap {
      case EqualTo(a: UnresolvedAttribute, l: Literal) =>
        for { c <- colOf(a); v <- eqLit(l) } yield (c, v)
      case EqualTo(l: Literal, a: UnresolvedAttribute) =>
        for { c <- colOf(a); v <- eqLit(l) } yield (c, v)
      case _ => None
    }.nextOption()
    eq match {
      case Some((c, v)) =>
        note(c, t.prunedFileCountEq(c, v))
        return Some(t.readEq(c, v).queryExecution.analyzed)
      case None => ()
    }
    // 2. range probe: a closed BETWEEN, or any >=/>/<=/<  pair on one
    // column (strict bounds prune with their closed superset — sound,
    // the residual Filter still applies the strict comparison)
    def bounds(colLit: PartialFunction[Expression, Option[(String, Literal)]])
        : Map[String, Literal] =
      conj.flatMap(e => colLit.lift(e).flatten).toMap
    val nLos = bounds {
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => colOf(a).map(_ -> l)
      case GreaterThan(a: UnresolvedAttribute, l: Literal) => colOf(a).map(_ -> l)
      case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) => colOf(a).map(_ -> l)
      case LessThan(l: Literal, a: UnresolvedAttribute) => colOf(a).map(_ -> l)
      case Between(a: UnresolvedAttribute, lo: Literal, _, _) => colOf(a).map(_ -> lo)
      case f: UnresolvedFunction if f.nameParts == Seq("between") =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute, lo: Literal, _: Literal) =>
            colOf(a).map(_ -> lo)
          case _ => None
        }
    }
    val nHis = bounds {
      case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) => colOf(a).map(_ -> l)
      case LessThan(a: UnresolvedAttribute, l: Literal) => colOf(a).map(_ -> l)
      case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => colOf(a).map(_ -> l)
      case GreaterThan(l: Literal, a: UnresolvedAttribute) => colOf(a).map(_ -> l)
      case Between(a: UnresolvedAttribute, _, hi: Literal, _) => colOf(a).map(_ -> hi)
      case f: UnresolvedFunction if f.nameParts == Seq("between") =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute, _: Literal, hi: Literal) =>
            colOf(a).map(_ -> hi)
          case _ => None
        }
    }
    val ranged = nLos.keySet.intersect(nHis.keySet).toSeq.sorted.iterator.flatMap { c =>
      (numLit(nLos(c)), numLit(nHis(c))) match {
        case (Some(lo), Some(hi)) =>
          Some((c, t.prunedFileCount(c, lo, hi),
            () => t.readRange(c, lo, hi)))
        case _ => (strLit(nLos(c)), strLit(nHis(c))) match {
          case (Some(lo), Some(hi)) =>
            Some((c, t.prunedFileCountStr(c, lo, hi),
              () => t.readRangeStr(c, lo, hi)))
          case _ => None
        }
      }
    }.nextOption()
    ranged.map { case (c, opened, build) =>
      note(c, opened)
      build().queryExecution.analyzed
    }
  }

  private val MetaTables = Set("snapshots", "partitions", "refs", "files")

  private def isGraft(ident: Seq[String], prefix: String): Boolean =
    ident.head == prefix && (ident.length == 2 || ident.length == 3 ||
      (ident.length == 4 && MetaTables.contains(ident(3))))

  private def splitIdent(ident: Seq[String], prefix: String): (String, String) =
    ident match {
      case Seq(`prefix`, ns, t) => (ns, t)
      case Seq(`prefix`, t) => ("default", t)
      case other => throw new IllegalArgumentException(
        s"not a $prefix table identifier: ${other.mkString(".")}")
    }

  private def readPlan(spark: SparkSession, cat: GraftCatalog,
      ident: Seq[String], prefix: String,
      ts: Option[Expression], ver: Option[String]): LogicalPlan = {
    // graft.<ns>.<table>.<meta> — the Iceberg metadata tables
    if (ident.length == 4) {
      require(ts.isEmpty && ver.isEmpty,
        s"metadata table ${ident.mkString(".")} does not support time travel")
      val t = cat.openTable(ident(1), ident(2))
      val df = ident(3) match {
        case "snapshots" => t.snapshotsMeta
        case "partitions" => t.partitionsMeta
        case "refs" => t.refsMeta
        case "files" => t.filesMeta
      }
      return df.queryExecution.analyzed
    }
    val (ns, tbl) = splitIdent(ident, prefix)
    val t = cat.openTable(ns, tbl)
    val df = (ts, ver) match {
      case (None, None) => t.read()
      case (None, Some(v)) if v.forall(_.isDigit) => t.read(asOf = v.toLong)
      case (None, Some(v)) => // VERSION AS OF '<tag-or-branch>' (Iceberg refs)
        if (t.tags.contains(v)) t.readTag(v)
        else if (t.branches.contains(v)) t.branch(v).read()
        else throw new IllegalArgumentException(
          s"no tag or branch named '$v' on $ns.$tbl")
      case (Some(e), None) => t.readAsOfTime(tsMillis(spark, e))
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "specify VERSION AS OF or TIMESTAMP AS OF, not both")
    }
    df.queryExecution.analyzed
  }

  /** Evaluate a literal TIMESTAMP AS OF expression to epoch millis.
    * An un-zoned timestamp literal is interpreted in the SESSION
    * timezone — exactly what Spark/Iceberg do for time travel — so the
    * same statement selects the same snapshot here and on the reference
    * stack (driver ADVICE r10; a zoned literal like '...Z' or '+02:00'
    * carries its own offset and is timezone-independent either way).
    */
  private def tsMillis(spark: SparkSession, e: Expression): Long = {
    val cast = Cast(e, TimestampType,
      Some(spark.conf.get("spark.sql.session.timeZone")))
    require(e.foldable, s"TIMESTAMP AS OF must be a literal, got: ${e.sql}")
    cast.eval() match {
      case micros: java.lang.Long => micros / 1000L
      case null => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF value does not parse as a timestamp: ${e.sql}")
    }
  }
}
