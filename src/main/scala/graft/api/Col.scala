package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Handle on one column of a table — the Spark-native analogue of the
  * reference's `Column` (reference: pandasdb/column.py:106-763).
  *
  * Holds no data: just the owning table's DataFrame, the column name, and the
  * result cache. Scalar aggregates are memoized under the canonicalized plan
  * (reference memoizes under the generated SQL string, column.py:132-304).
  *
  * All aggregates execute as distributed Spark jobs (partial aggregation
  * map-side, single final combine) — at 100 TB each is one column-pruned scan;
  * with parquet statistics min/max can be answered from footers.
  */
final class Col private[api] (
    private[api] val table: Table,
    val name: String) {

  private def df: DataFrame = table.toDf
  private def cache: QueryCache = table.cache
  private def c: Column = col(name)
  private def colDf: DataFrame = df.select(c)

  /** Spark SQL type of the column (replaces the reference's PRAGMA probe,
    * column.py:135-147 — schema is free in Spark).
    */
  def sqlType: DataType = df.schema(name).dataType

  def isNumeric: Boolean = sqlType.isInstanceOf[NumericType]

  private def requireNumeric(op: String): Unit =
    if (!isNumeric)
      throw new ColumnTypeError(
        s"cannot compute $op() of non-numeric column '$name' (type ${sqlType.simpleString})")

  // ---- aggregates (reference §2.4) -------------------------------------

  /** Total row count of the owning table (reference: column.py:155-160). */
  def len: Long = table.len

  /** Non-null count (reference: column.py:162-166). */
  def count: Long = cache.memo(colDf.agg(F.count(c))) {
    df.agg(F.count(c)).head().getLong(0)
  }

  /** Null count (reference: column.py:168-172). */
  def nullCount: Long = cache.memo(df.filter(c.isNull).select(c)) {
    df.filter(c.isNull).count()
  }

  def min: Any = cache.memo(df.agg(Aggs.minAgg(c))) {
    df.agg(Aggs.minAgg(c)).head().get(0)
  }

  def max: Any = cache.memo(df.agg(Aggs.maxAgg(c))) {
    df.agg(Aggs.maxAgg(c)).head().get(0)
  }

  /** Sum; raises on non-numeric columns (reference: column.py:186-196). */
  def sum: Double = {
    requireNumeric("sum")
    cache.memo(df.agg(Aggs.sumAgg(c))) {
      val r = df.agg(Aggs.sumAgg(c)).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
  }

  /** Mean; raises on non-numeric columns (reference: column.py:198-208). */
  def avg: Double = {
    requireNumeric("avg")
    val r = cache.memo(df.agg(Aggs.avgAgg(c)))(df.agg(Aggs.avgAgg(c)).head())
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** Exact median — the reference computes it exactly client-side
    * (column.py:210-231) and its tests demand pandas equality to 4 places;
    * Spark's `median` is an exact percentile, not approx (SURVEY.md §4.3.2).
    */
  def median: Double = {
    requireNumeric("median")
    // memo key stays the canonical median-agg plan; the VALUE is computed
    // by distributed order-statistic selection (StatsOps.exactPercentiles)
    // — the built-in median aggregate merges the full value→count map on
    // ONE reducer, a choke point on high-cardinality columns at scale
    val agg = df.agg(Aggs.medianAgg(c))
    cache.memo(agg) {
      val proj = df.select(c.cast("double").as("__m"))
      try graft.ops.StatsOps.exactPercentiles(proj, "__m", Seq(0.5)).head
      catch { case _: IllegalArgumentException => Double.NaN }
    }
  }

  /** All tied modes with their counts; null participates as a value
    * (reference: column.py:233-249).
    */
  def mode: Map[Any, Long] = cache.memo(colDf.groupBy(c).count()) {
    modePlan.collect().map(r => (r.get(0), r.getLong(1))).toMap
  }

  /** The distributed mode plan: agg-max + broadcast equality join (the
    * q_mode_hc pattern). A global window would sort ALL distinct values on
    * one partition — a choke point on a high-cardinality column at scale;
    * here the 1-row max broadcasts and the counts stay distributed.
    * Exposed for the plan assertion in ApiSpec.
    */
  private[graft] def modePlan: DataFrame = {
    val counts = df.groupBy(c).agg(F.count(lit(1)).as("__cnt"))
    val mx = counts.agg(F.max(col("__cnt")).as("__mx"))
    counts.join(F.broadcast(mx), col("__cnt") === col("__mx"))
      .select(c, col("__cnt"))
  }

  /** Distinct values incl. null (reference: column.py:281-287). */
  def unique: Seq[Any] =
    cache.memo(colDf.distinct())(colDf.distinct().collect().map(_.get(0)).toSeq)

  /** Value → count, null excluded, ordered count DESC then value ASC
    * (pandas semantics; reference: column.py:289-304).
    */
  def valueCounts: Seq[(Any, Long)] = {
    val q = df.filter(c.isNotNull).groupBy(c).agg(F.count(lit(1)).as("count"))
      .orderBy(desc("count"), asc(name))
    cache.memo(q)(q.collect().map(r => (r.get(0), r.getLong(1))).toSeq)
  }

  /** Composite stats: numeric → len/count/min/max/sum/avg/median,
    * text → len/count/min/max/unique (reference: column.py:251-279).
    */
  def describe: Map[String, Any] =
    if (isNumeric)
      Map("len" -> len, "count" -> count, "min" -> min, "max" -> max,
        "sum" -> sum, "avg" -> avg, "median" -> median)
    else
      Map("len" -> len, "count" -> count, "min" -> min, "max" -> max,
        "unique" -> unique.length)

  // ---- predicates → Expr (reference §2.3) ------------------------------

  private def expr(cond: Column): Expr = Expr(cond, table.name)

  def >(v: Any): Expr = expr(c > lit(v))
  def >=(v: Any): Expr = expr(c >= lit(v))
  def <(v: Any): Expr = expr(c < lit(v))
  def <=(v: Any): Expr = expr(c <= lit(v))

  /** Null-aware equality: `=== null` compiles to IS NULL
    * (reference: column.py:709-727).
    */
  def ===(v: Any): Expr = if (v == null) expr(c.isNull) else expr(c === lit(v))
  def =!=(v: Any): Expr = if (v == null) expr(c.isNotNull) else expr(c =!= lit(v))

  def isin(vs: Any*): Expr = expr(c.isin(vs: _*))
  def between(lo: Any, hi: Any): Expr = expr(c.between(lit(lo), lit(hi)))

  /** Case-INSENSITIVE pattern match: SQLite LIKE is case-insensitive
    * (reference tests/test_column.py:685-695), so this maps to Spark `ilike`,
    * not `like` (SURVEY.md §4.3.4).
    */
  def like(pattern: String): Expr = expr(c.ilike(pattern))

  def notNull: Expr = expr(c.isNotNull)

  /** Membership probe (`x in col`) as a limit-1 pushdown scan
    * (reference: column.py:589-595).
    */
  def contains(v: Any): Boolean =
    df.filter(if (v == null) c.isNull else c === lit(v)).limit(1).count() == 1L

  // ---- derived views (reference §2.5) ----------------------------------

  /** Single-column table view for chaining filter/sort/limit like the
    * reference's ColumnView (column.py:766).
    */
  def view: Table = table.select(Seq(name))

  def filter(e: Expr): Table = view.filter(e)

  /** Positional access on the column (reference `Column.iloc`,
    * column.py:338-353 via IndexLoc): int (± negative), slice, and id-list
    * forms, each returning bare values.
    */
  def iloc(i: Long): Any = view.iloc(i).get(0)
  def iloc(start: Long, stop: Long, step: Long = 1): Seq[Any] =
    view.iloc(start, stop, step).map(_.get(0))
  def iloc(ids: Seq[Long]): Seq[Any] = view.iloc(ids).map(_.get(0))
  def ilocSlice(start: Option[Long] = None, stop: Option[Long] = None,
      step: Long = 1): Seq[Any] = view.ilocSlice(start, stop, step).map(_.get(0))
  def sortValues(ascending: Boolean = true): Table =
    new Table(table.db, colDf.orderBy(if (ascending) asc(name) else desc(name)),
      table.name, cache, ordered = true)
  def limit(n: Int): Table = view.limit(n)
  def notNullView: Table = new Table(table.db, df.filter(c.isNotNull).select(c), table.name, cache)

  // ---- materialization (reference §2.1 S7-S9) --------------------------

  /** Values; with a limit, the FIRST n in base order (reference
    * data(limit) is head-n, column.py:314-326 — a bare Spark limit takes
    * arbitrary rows).
    */
  def data(limit: Int = -1): Seq[Any] = {
    val d =
      if (limit < 0) colDf
      else df.select(c, monotonically_increasing_id().as("__mid"))
        .orderBy("__mid").limit(limit).drop("__mid")
    d.collect().map(_.get(0)).toSeq
  }
  def toSeq: Seq[Any] = data()
  def iterator: Iterator[Any] = colDf.toLocalIterator().asScala.map(_.get(0))

  /** Pandas-Series-style rendering (reference `__repr__`,
    * column.py:581-587): first/last values with an ellipsis when longer
    * than `maxRows`, plus the `Name: ..., dtype: ...` footer. Reads at most
    * `maxRows` rows.
    */
  def repr(maxRows: Int = 10): String = {
    val v = view
    val n = v.len
    val half = math.max(maxRows / 2, 1)
    val (idx, rows) =
      if (n <= maxRows) ((0L until n), v.iloc(0L, n))
      else ((0L until half) ++ (n - half until n),
        v.iloc(0L, half) ++ v.iloc(n - half, n))
    val vals = rows.map(r => if (r.isNullAt(0)) "NaN" else r.get(0).toString)
    val entries = {
      val z = idx.map(_.toString).zip(vals)
      if (n <= maxRows) z
      else { val (t, b) = z.splitAt(half); (t :+ ("..." -> "...")) ++ b }
    }
    val iw = entries.map(_._1.length).max
    val vw = entries.map(_._2.length).max
    entries.map { case (i, x) =>
      (" " * (iw - i.length)) + i + "  " + (" " * (vw - x.length)) + x
    }.mkString("\n") +
      s"\nName: $name, dtype: ${df.schema(name).dataType.simpleString}"
  }

  /** Exactly-n random values (reference: column.py:328-336 does
    * `ORDER BY RANDOM() LIMIT n`). Distributed top-k on a random key —
    * TakeOrderedAndProject, no full sort, same shape as Table.sample.
    */
  def sample(n: Int = 10, seed: Long = scala.util.Random.nextLong()): Seq[Any] =
    colDf.orderBy(rand(seed)).limit(n).collect().map(_.get(0)).toSeq

  private implicit class RichIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  // ---- element-wise arithmetic (reference §2.8 U3/U4) ------------------

  /** Element-wise ops against a scalar or a same-table column; nulls
    * propagate natively (reference: column.py:597-675). Cross-table zips —
    * the reference's strict-length iterator zip — are row-index equi-joins,
    * see Table.zipWith.
    */
  private def arith(f: Column => Column): DataFrame =
    df.select(f(c).as(name))

  /** Column-column ops: same-table columns combine in one projection;
    * columns from ANOTHER table zip positionally via the strict row-index
    * join (the reference zips arbitrary equal-length iterables,
    * column.py:604-607 — resolving the other table's column name against
    * this table would be silently wrong).
    */
  private def combine(o: Col, f: (Column, Column) => Column): DataFrame =
    if (o.table eq table) arith(x => f(x, col(o.name)))
    else zipWith(o, f)

  def +(v: Any): DataFrame = v match {
    case o: Col => combine(o,
      (x, y) => if (sqlType == StringType) concat(x, y) else x + y)
    case s: String => arith(x => concat(x, lit(s)))
    case _ => arith(_ + lit(v))
  }
  def -(v: Any): DataFrame = v match {
    case o: Col => combine(o, _ - _); case _ => arith(_ - lit(v))
  }
  def *(v: Any): DataFrame = v match {
    case o: Col => combine(o, _ * _); case _ => arith(_ * lit(v))
  }
  def /(v: Any): DataFrame = v match {
    case o: Col => combine(o, _ / _); case _ => arith(_ / lit(v))
  }
  def floorDiv(v: Any): DataFrame = v match {
    case o: Col => combine(o, (x, y) => floor(x / y))
    case _ => arith(x => floor(x / lit(v)))
  }

  /** Null-propagating per-element function application (reference `apply`,
    * column.py:338-364, `ignore_na=True`). Typed overloads keep Spark
    * Encoders happy; execution is a codegen'd map over the column.
    */
  /** Cross-table element-wise combine — the reference's strict iterator zip
    * (column.py:604-607, strict=True raises on length mismatch). Distributed
    * form: row-index equi-join on both tables' minted __rowid, after an
    * explicit length check (SURVEY.md §7.4.4).
    */
  def zipWith(other: Col, f: (Column, Column) => Column): DataFrame = {
    if (table.len != other.table.len)
      throw new IndexOutOfBoundsError(
        s"cannot zip columns of different lengths: ${table.len} vs ${other.table.len}")
    import Table.ROWID
    val l = table.indexed.select(col(ROWID), c.as("__l"))
    val r = other.table.indexed.select(col(ROWID), col(other.name).as("__r"))
    l.join(r, ROWID)
      .orderBy(ROWID)
      .select(f(col("__l"), col("__r")).as(name))
  }

  /** Generic cell-wise apply with extra positional/keyword arguments —
    * the full reference arity (column.py:338-364: `apply(func, *,
    * ignore_na=True, args=(), **kwargs)` yields `func(cell, *args,
    * **kwargs)` per cell, a driver-side generator, with nulls passed
    * through unevaluated when `ignore_na`). Same contract here: a lazy
    * iterator over `func(cell, args, kwargs)` — deliberately NOT a
    * distributed plan, because an arbitrary `Any => Any` closure over
    * untyped cells is driver territory; the typed applyStr/Double/Long
    * overloads below are the distributed (codegen-UDF) path.
    */
  def apply[T](func: (Any, Seq[Any], Map[String, Any]) => T,
      ignoreNa: Boolean = true, args: Seq[Any] = Nil,
      kwargs: Map[String, Any] = Map.empty): Iterator[Any] =
    iterator.map { cell =>
      if (cell == null && ignoreNa) null else func(cell, args, kwargs)
    }

  def applyStr(f: String => String): DataFrame = {
    val u = udf((s: String) => if (s == null) null else f(s))
    df.select(u(c).as(name))
  }
  def applyDouble(f: Double => Double): DataFrame = {
    val u = udf((d: java.lang.Double) =>
      if (d == null) null else java.lang.Double.valueOf(f(d)))
    df.select(u(c).as(name))
  }
  def applyLong(f: Long => Long): DataFrame = {
    val u = udf((d: java.lang.Long) =>
      if (d == null) null else java.lang.Long.valueOf(f(d)))
    df.select(u(c).as(name))
  }
}

/** Internal aggregate builders shared by Col (kept out of the class so cache
  * keys canonicalize identically across Col instances).
  */
private[api] object Aggs {
  def minAgg(c: Column): Column = org.apache.spark.sql.functions.min(c)
  def maxAgg(c: Column): Column = org.apache.spark.sql.functions.max(c)
  def sumAgg(c: Column): Column =
    org.apache.spark.sql.functions.sum(c.cast(DoubleType))
  def avgAgg(c: Column): Column =
    org.apache.spark.sql.functions.avg(c.cast(DoubleType))
  def medianAgg(c: Column): Column =
    org.apache.spark.sql.functions.median(c.cast(DoubleType))
}
