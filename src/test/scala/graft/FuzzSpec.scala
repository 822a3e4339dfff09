package graft

import graft.Polars._
import graft.api.DataFrame
import graft.expr.Expr
import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._

/** Differential fuzz harness (round-15 top directive): seeded random small
  * frames (nulls, NaN, ±inf, -0.0, empty strings, duplicate keys,
  * multi-partition layouts, empty frames) run through random 2-4-op
  * pipelines on BOTH graft and a local row-oriented reference model that
  * encodes the reference's semantics (polars 0.41 — nulls-first sort,
  * total-order float comparisons where NaN is greatest and equal to
  * itself, NaN-skipping min/max, IEEE division, row-order first/last,
  * null-counting n_unique). A divergence fails with the seed, the pipeline,
  * and a greedily-shrunk repro. The model is intentionally simple,
  * imperative Scala over Vectors — it shares no code with the engine, so a
  * bug must be made twice to slip through.
  */
object Fuzz {
  sealed trait FTy
  case object FI extends FTy // i64    (Long)
  case object FD extends FTy // f64    (Double)
  case object FS extends FTy // str    (String)
  case object FB extends FTy // bool   (Boolean)

  /** Row-major local frame: cells are null | Long | Double | String | Boolean. */
  final case class MFrame(schema: Vector[(String, FTy)], rows: Vector[Vector[Any]]) {
    def idx(name: String): Int = schema.indexWhere(_._1 == name)
    def ty(name: String): FTy = schema(idx(name))._2
    def col(name: String): Vector[Any] = { val i = idx(name); rows.map(_(i)) }
    def names: Vector[String] = schema.map(_._1)
  }

  // ---- pipeline ops ----
  sealed trait Op
  final case class Filter(c: String, cmp: String, lit: Any) extends Op
  final case class FilterBool(c: String) extends Op
  final case class WithArith(out: String, a: String, op: String, b: Either[String, Any]) extends Op
  final case class SelectCols(names: Vector[String]) extends Op
  final case class SortOp(by: String, desc: Boolean, nullsLast: Boolean) extends Op
  final case class HeadOp(n: Int) extends Op
  final case class TailOp(n: Int) extends Op
  final case class SliceOp(off: Int, len: Int) extends Op
  case object ReverseOp extends Op
  final case class GatherEveryOp(n: Int, off: Int) extends Op
  final case class UniqueOp(subset: Vector[String], keep: String) extends Op
  final case class DropNullsOp(subset: Vector[String]) extends Op
  final case class FillNullOp(c: String, v: Any) extends Op
  final case class ShiftOp(out: String, c: String, n: Int) extends Op
  final case class CumOp(out: String, c: String, kind: String) extends Op // sum|min|max over i64
  final case class DiffOp(out: String, c: String) extends Op
  final case class StrOp(out: String, c: String, kind: String, arg: String = "") extends Op
  case object RowIndexOp extends Op
  /** Terminal: group_by(key).agg(agg(v)).sort(key). */
  final case class GroupAgg(key: String, v: String, agg: String) extends Op

  // ---- helpers shared by model + checks ----
  private def isNum(v: Any): Boolean = v.isInstanceOf[Long] || v.isInstanceOf[Double]
  private def asD(v: Any): Double = v match {
    case l: Long => l.toDouble; case d: Double => d
    case other => throw new IllegalStateException(s"not numeric: $other")
  }
  /** Total-order compare for sort and comparisons: NaN greatest, -0.0 == 0.0
    * (both engines), strings byte-order (ASCII-dominated pool ⇒ UTF-16
    * compare agrees with UTF-8), booleans false < true. Nulls handled by
    * callers. */
  private def cmpNonNull(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case _ =>
      val (x, y) = (asD(a), asD(b))
      if (x.isNaN && y.isNaN) 0 else if (x.isNaN) 1 else if (y.isNaN) -1
      else java.lang.Double.compare(if (x == 0.0) 0.0 else x, if (y == 0.0) 0.0 else y)
  }
  /** Grouping/dedup key: nulls equal, NaN equal, -0.0 == 0.0. */
  private def keyOf(v: Any): Any = v match {
    case d: Double if d.isNaN => "NaN-key"
    case d: Double if d == 0.0 => 0.0
    case other => other
  }

  // ---- the reference model ----
  def run(m0: MFrame, ops: Seq[Op]): MFrame = ops.foldLeft(m0)(step)

  private def step(m: MFrame, op: Op): MFrame = op match {
    case Filter(c, cmp, lit) =>
      val i = m.idx(c)
      MFrame(m.schema, m.rows.filter { r =>
        val v = r(i)
        if (v == null) false
        else {
          val k = cmpNonNull(v, lit)
          cmp match {
            case ">" => k > 0; case ">=" => k >= 0; case "<" => k < 0
            case "<=" => k <= 0; case "==" => k == 0; case "!=" => k != 0
          }
        }
      })
    case FilterBool(c) =>
      val i = m.idx(c)
      MFrame(m.schema, m.rows.filter(r => r(i) == true))
    case WithArith(out, a, opr, b) =>
      val ia = m.idx(a)
      val tb: FTy = b.fold(m.ty, { case _: Long => FI; case _ => FD })
      val outTy = if (opr == "/") FD else if (m.ty(a) == FI && tb == FI) FI else FD
      val rows = m.rows.map { r =>
        val va = r(ia)
        val vb = b.fold(n => r(m.idx(n)), identity)
        val cell: Any =
          if (va == null || vb == null) null
          else if (opr == "/") { // polars true division is IEEE f64
            asD(va) / asD(vb)
          } else if (m.ty(a) == FI && tb == FI) {
            val (x, y) = (va.asInstanceOf[Long], vb.asInstanceOf[Long])
            opr match { case "+" => x + y; case "-" => x - y; case "*" => x * y }
          } else {
            val (x, y) = (asD(va), asD(vb))
            opr match { case "+" => x + y; case "-" => x - y; case "*" => x * y }
          }
        r :+ cell
      }
      MFrame(m.schema :+ (out -> outTy), rows)
    case SelectCols(names) =>
      val is = names.map(m.idx)
      MFrame(names.map(n => n -> m.ty(n)), m.rows.map(r => is.map(r)))
    case SortOp(by, desc, nullsLast) =>
      val i = m.idx(by)
      // stable sort on (value, original position) — graft mirrors by sorting
      // on (col, id) with id unique, so ties can't flake either side
      val sorted = m.rows.zipWithIndex.sortWith { case ((r1, p1), (r2, p2)) =>
        val (v1, v2) = (r1(i), r2(i))
        val k =
          if (v1 == null && v2 == null) 0
          else if (v1 == null) { if (nullsLast) 1 else -1 }
          else if (v2 == null) { if (nullsLast) -1 else 1 }
          else { val c = cmpNonNull(v1, v2); if (desc) -c else c }
        if (k != 0) k < 0 else p1 < p2
      }
      MFrame(m.schema, sorted.map(_._1))
    case HeadOp(n) => MFrame(m.schema, m.rows.take(n))
    case TailOp(n) => MFrame(m.schema, m.rows.takeRight(n))
    case SliceOp(off, len) => MFrame(m.schema, m.rows.slice(off, off + len))
    case ReverseOp => MFrame(m.schema, m.rows.reverse)
    case GatherEveryOp(n, off) =>
      MFrame(m.schema, m.rows.zipWithIndex.collect {
        case (r, i) if i >= off && (i - off) % n == 0 => r
      })
    case UniqueOp(subset, keep) =>
      val is = subset.map(m.idx)
      def key(r: Vector[Any]) = is.map(i => keyOf(r(i)))
      val kept = keep match {
        case "first" =>
          val seen = collection.mutable.Set[Vector[Any]]()
          m.rows.filter(r => seen.add(key(r)))
        case "last" =>
          val seen = collection.mutable.Set[Vector[Any]]()
          m.rows.reverse.filter(r => seen.add(key(r))).reverse
        case "none" =>
          val counts = m.rows.groupBy(key).view.mapValues(_.size).toMap
          m.rows.filter(r => counts(key(r)) == 1)
      }
      MFrame(m.schema, kept)
    case DropNullsOp(subset) =>
      val is = subset.map(m.idx)
      MFrame(m.schema, m.rows.filter(r => is.forall(i => r(i) != null)))
    case FillNullOp(c, v) =>
      val i = m.idx(c)
      MFrame(m.schema, m.rows.map(r => if (r(i) == null) r.updated(i, v) else r))
    case ShiftOp(out, c, n) =>
      val i = m.idx(c)
      val src = m.rows.map(_(i))
      val shifted = Vector.tabulate(src.size) { j =>
        val k = j - n; if (k >= 0 && k < src.size) src(k) else null
      }
      MFrame(m.schema :+ (out -> m.ty(c)), m.rows.zip(shifted).map { case (r, v) => r :+ v })
    case CumOp(out, c, kind) =>
      val i = m.idx(c)
      var acc: Option[Long] = None
      val vals = m.rows.map { r =>
        r(i) match {
          case null => null
          case v: Long =>
            acc = Some(acc.fold(v)(a => kind match {
              case "sum" => a + v; case "min" => math.min(a, v); case "max" => math.max(a, v)
            }))
            acc.get
        }
      }
      MFrame(m.schema :+ (out -> FI), m.rows.zip(vals).map { case (r, v) => r :+ v })
    case DiffOp(out, c) =>
      val i = m.idx(c)
      val src = m.rows.map(_(i))
      val ty = m.ty(c)
      // tabulate[Any]: without the explicit element type the if/else's
      // Long and Double branches weak-lub to Double and the i64 diff cell
      // silently boxes as 1.0 (the round-15 fuzz CCE was THIS, not graft)
      val vals = Vector.tabulate[Any](src.size) { j =>
        val prev = if (j > 0) src(j - 1) else null
        val cur = src(j)
        if (cur == null || prev == null) null
        else if (ty == FI) cur.asInstanceOf[Long] - prev.asInstanceOf[Long]
        else asD(cur) - asD(prev)
      }
      MFrame(m.schema :+ (out -> ty), m.rows.zip(vals).map { case (r, v) => r :+ v })
    case StrOp(out, c, kind, arg) =>
      val i = m.idx(c)
      val outTy = kind match {
        case "upper" | "lower" => FS
        case "len" => FI
        case "starts_with" | "contains_lit" => FB
      }
      val vals = m.rows.map { r =>
        r(i) match {
          case null => null
          case s: String => kind match {
            case "upper" => s.toUpperCase
            case "lower" => s.toLowerCase
            case "len" => s.codePointCount(0, s.length).toLong
            case "starts_with" => s.startsWith(arg)
            case "contains_lit" => s.contains(arg)
          }
        }
      }
      MFrame(m.schema :+ (out -> outTy), m.rows.zip(vals).map { case (r, v) => r :+ v })
    case RowIndexOp =>
      MFrame(("index" -> FI) +: m.schema,
        m.rows.zipWithIndex.map { case (r, i) => (i.toLong: Any) +: r })
    case GroupAgg(key, v, agg) =>
      val ik = m.idx(key); val iv = m.idx(v)
      val groups = m.rows.zipWithIndex.groupBy { case (r, _) => keyOf(r(ik)) }
      val outTy = agg match {
        case "sum" | "min" | "max" | "first" | "last" => m.ty(v)
        case "mean" => FD
        case "count" | "n_unique" => FI
      }
      val out = groups.toVector
        .map { case (_, g) => (g.head._1(ik), g.map(_._1(iv))) }
        .map { case (kv, vs) =>
          val nonNull = vs.filter(_ != null)
          val cell: Any = agg match {
            case "sum" =>
              if (m.ty(v) == FI) nonNull.map(_.asInstanceOf[Long]).sum
              else nonNull.map(asD).sum // empty → 0.0, polars sum identity
            case "mean" =>
              if (nonNull.isEmpty) null else nonNull.map(asD).sum / nonNull.size
            case "min" | "max" =>
              // polars min/max SKIP NaN; all-NaN → NaN; all-null → null
              val candidates = nonNull.filterNot(x => x.isInstanceOf[Double] && asD(x).isNaN)
              if (candidates.nonEmpty) {
                if (agg == "min") candidates.minBy(identity)(Ordering.fromLessThan(cmpNonNull(_, _) < 0))
                else candidates.maxBy(identity)(Ordering.fromLessThan(cmpNonNull(_, _) < 0))
              } else if (nonNull.nonEmpty) Double.NaN
              else null
            case "count" => nonNull.size.toLong
            case "n_unique" => // polars: null IS a unique value
              (nonNull.map(keyOf).distinct.size + (if (vs.exists(_ == null)) 1 else 0)).toLong
            case "first" => vs.headOption.orNull
            case "last" => vs.lastOption.orNull
          }
          (kv, cell)
        }
      // deterministic finish: sort by key, nulls first
      val sorted = out.sortWith { case ((k1, _), (k2, _)) =>
        if (k1 == null) k2 != null
        else if (k2 == null) false
        else cmpNonNull(k1, k2) < 0
      }
      MFrame(Vector(key -> m.ty(key), "out" -> outTy), sorted.map { case (k, c) => Vector(k, c) })
  }
}

object FuzzGen {
  import Fuzz._
  import scala.util.Random
  // ---- frame generator ----
  val intPool = Vector(-3L, -1L, 0L, 1L, 2L, 5L, 7L, 100L, 999983L)
  val dblPool = Vector(-2.5, -1.0, -0.0, 0.0, 0.5, 1.5, 3.25,
    Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
  val strPool = Vector("", "a", "b", "ab", "Foo", "foo", "ZZ", "x y")
  def pick[A](rnd: Random, pool: Vector[A], nullFrac: Double = 0.2): Any =
    if (rnd.nextDouble() < nullFrac) null else pool(rnd.nextInt(pool.size))

  def genFrame(rnd: Random): MFrame = {
    val n = rnd.nextInt(26) // 0..25 rows, incl. the empty frame
    val schema = Vector("id" -> (FI: FTy), "k" -> FS, "i" -> FI, "f" -> FD, "s" -> FS, "b" -> FB)
    val rows = Vector.tabulate(n) { r =>
      Vector[Any](
        r.toLong,
        pick(rnd, Vector("a", "b", "c"), 0.15),
        pick(rnd, intPool),
        pick(rnd, dblPool),
        pick(rnd, strPool),
        pick(rnd, Vector(true, false)))
    }
    MFrame(schema, rows)
  }

  // ---- pipeline generator (schema-aware) ----
  def genOps(rnd: Random, schema0: Vector[(String, FTy)]): Vector[Op] = {
    var schema = schema0
    var fresh = 0
    def newName(): String = { fresh += 1; s"w$fresh" }
    def colsOf(t: FTy) = schema.filter(_._2 == t).map(_._1)
    def anyCol() = schema(rnd.nextInt(schema.size))._1
    def numCol(): Option[String] = {
      val cs = colsOf(FI) ++ colsOf(FD); if (cs.isEmpty) None else Some(cs(rnd.nextInt(cs.size)))
    }
    def litFor(t: FTy, forCompare: Boolean): Any = t match {
      case FI => intPool(rnd.nextInt(intPool.size))
      case FD =>
        // NaN/±inf literals in COMPARISONS stay out (total-order vs IEEE
        // ambiguity is pinned by goldens, not fuzz); arithmetic keeps them
        val pool = if (forCompare) dblPool.filter(d => !d.isNaN && !d.isInfinite) else dblPool
        pool(rnd.nextInt(pool.size))
      case FS => strPool(rnd.nextInt(strPool.size))
      case FB => rnd.nextBoolean()
    }
    val nOps = 2 + rnd.nextInt(3) // 2..4
    val ops = Vector.newBuilder[Op]
    var terminal = false
    var i = 0
    while (i < nOps && !terminal) {
      val isLast = i == nOps - 1
      val choice = rnd.nextInt(17)
      val op: Option[Op] = choice match {
        case 0 =>
          val c = anyCol(); val t = schema(schema.indexWhere(_._1 == c))._2
          val cmp = Vector(">", ">=", "<", "<=", "==", "!=")(rnd.nextInt(6))
          if (t == FB) Some(FilterBool(c)) else Some(Filter(c, cmp, litFor(t, forCompare = true)))
        case 1 => numCol().map { a =>
          val out = newName()
          val op = Vector("+", "-", "*", "/")(rnd.nextInt(4))
          val b: Either[String, Any] =
            if (rnd.nextBoolean()) Left(numCol().get)
            else Right(litFor(if (rnd.nextBoolean()) FI else FD, forCompare = false))
          schema = schema :+ (out -> (if (op == "/") FD
            else {
              val ta = schema(schema.indexWhere(_._1 == a))._2
              val tb = b.fold(n => schema(schema.indexWhere(_._1 == n))._2,
                { case _: Long => FI; case _ => FD })
              if (ta == FI && tb == FI) FI else FD
            }))
          WithArith(out, a, op, b)
        }
        case 2 =>
          val keep = rnd.shuffle(schema.map(_._1)).take(1 + rnd.nextInt(schema.size))
          schema = keep.map(n => n -> schema(schema.indexWhere(_._1 == n))._2)
          Some(SelectCols(keep))
        case 3 => Some(SortOp(anyCol(), rnd.nextBoolean(), rnd.nextBoolean()))
        case 4 => Some(HeadOp(rnd.nextInt(8)))
        case 5 => Some(TailOp(rnd.nextInt(8)))
        case 6 => Some(SliceOp(rnd.nextInt(6), rnd.nextInt(8)))
        case 7 => Some(ReverseOp)
        case 8 => Some(GatherEveryOp(1 + rnd.nextInt(4), rnd.nextInt(3)))
        case 9 =>
          val subset = rnd.shuffle(schema.map(_._1)).take(1 + rnd.nextInt(2))
          Some(UniqueOp(subset, Vector("first", "last", "none")(rnd.nextInt(3))))
        case 10 =>
          val subset = rnd.shuffle(schema.map(_._1)).take(1 + rnd.nextInt(2))
          Some(DropNullsOp(subset))
        case 11 =>
          val c = anyCol(); val t = schema(schema.indexWhere(_._1 == c))._2
          Some(FillNullOp(c, litFor(t, forCompare = false)))
        case 12 =>
          val c = anyCol(); val out = newName()
          schema = schema :+ (out -> schema(schema.indexWhere(_._1 == c))._2)
          Some(ShiftOp(out, c, rnd.nextInt(5) - 2))
        case 13 => colsOf(FI).headOption.map { _ =>
          val cs = colsOf(FI); val c = cs(rnd.nextInt(cs.size)); val out = newName()
          schema = schema :+ (out -> FI)
          CumOp(out, c, Vector("sum", "min", "max")(rnd.nextInt(3)))
        }
        case 14 => numCol().map { c =>
          val out = newName()
          schema = schema :+ (out -> schema(schema.indexWhere(_._1 == c))._2)
          DiffOp(out, c)
        }
        case 15 =>
          val cs = colsOf(FS)
          if (cs.isEmpty) None else {
            val c = cs(rnd.nextInt(cs.size)); val out = newName()
            val kind = Vector("upper", "lower", "len", "starts_with", "contains_lit")(rnd.nextInt(5))
            val arg = Vector("a", "F", "b", "")(rnd.nextInt(4))
            schema = schema :+ (out -> (kind match {
              case "upper" | "lower" => FS
              case "len" => FI
              case _ => FB
            }))
            Some(StrOp(out, c, kind, arg))
          }
        case 16 if isLast =>
          val keyPool = schema.filter(c => c._2 == FS || c._2 == FB || c._2 == FI).map(_._1)
          val numeric = (colsOf(FI) ++ colsOf(FD))
          if (keyPool.isEmpty) None else {
            val key = keyPool(rnd.nextInt(keyPool.size))
            val agg = Vector("sum", "mean", "min", "max", "count", "n_unique", "first", "last")(rnd.nextInt(8))
            val vPool = if (agg == "sum" || agg == "mean") numeric
                        else schema.map(_._1).filterNot(_ == key)
            if (vPool.isEmpty) None else {
              terminal = true
              Some(GroupAgg(key, vPool(rnd.nextInt(vPool.size)), agg))
            }
          }
        case _ => None
      }
      op.foreach { o => ops += o; i += 1 }
      if (op.isEmpty) i += 1 // skip dead choices so generation terminates
    }
    ops.result()
  }
}

class FuzzSpec extends SparkSpec {
  import Fuzz._
  import scala.util.Random

  import FuzzGen.{genFrame, genOps}

  // ---- graft runner ----
  private def toSpark(m: MFrame): DataFrame = {
    val fields = m.schema.map { case (n, t) =>
      StructField(n, t match {
        case FI => LongType; case FD => DoubleType; case FS => StringType; case FB => BooleanType
      }, nullable = true)
    }
    val rows = m.rows.map(r => Row.fromSeq(r))
    // 3 explicit slices: multi-partition row-order discipline under test
    DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 3), StructType(fields)))
  }

  private def applyOp(df: DataFrame, op: Op): DataFrame = op match {
    case Filter(c, cmp, lit) => df.filter(cmp match {
      case ">" => col(c) > lit; case ">=" => col(c) >= lit; case "<" => col(c) < lit
      case "<=" => col(c) <= lit; case "==" => col(c) === lit; case "!=" => col(c) !== lit
    })
    case FilterBool(c) => df.filter(col(c))
    case WithArith(out, a, op, b) =>
      val rhs: Expr = b.fold(col, v => Expr.lit(v))
      df.withColumn(out, op match {
        case "+" => col(a) + rhs; case "-" => col(a) - rhs
        case "*" => col(a) * rhs; case "/" => col(a) / rhs
      })
    case SelectCols(names) => df.selectNames(names: _*)
    case SortOp(by, desc, nullsLast) =>
      // stable-sort mirror: tie-break on the pre-sort row position, exactly
      // the model's stable sort (polars itself leaves ties unspecified)
      df.withRowIndex("__tb__")
        .sortBy(Seq(col(by), col("__tb__")), Seq(desc, false), nullsLast)
        .drop("__tb__")
    case HeadOp(n) => df.head(n)
    case TailOp(n) => df.tail(n)
    case SliceOp(off, len) => df.slice(off, len)
    case ReverseOp => df.reverse
    case GatherEveryOp(n, off) => df.gatherEvery(n, off)
    case UniqueOp(subset, keep) => df.unique(subset, keep, maintainOrder = true)
    case DropNullsOp(subset) => df.dropNulls(subset)
    case FillNullOp(c, v) => df.withColumn(c, col(c).fillNull(v))
    case ShiftOp(out, c, n) => df.withColumn(out, col(c).shift(n))
    case CumOp(out, c, kind) => df.withColumn(out, kind match {
      case "sum" => col(c).cumSum(); case "min" => col(c).cumMin(); case "max" => col(c).cumMax()
    })
    case DiffOp(out, c) => df.withColumn(out, col(c).diff())
    case StrOp(out, c, kind, arg) => df.withColumn(out, kind match {
      case "upper" => col(c).str.toUppercase
      case "lower" => col(c).str.toLowercase
      case "len" => col(c).str.lenChars
      case "starts_with" => col(c).str.startsWith(arg)
      case "contains_lit" => col(c).str.contains(arg, literal = true)
    })
    case RowIndexOp => df.withRowIndex("index")
    case GroupAgg(key, v, agg) =>
      df.groupBy(key).agg((agg match {
        case "sum" => col(v).sum; case "mean" => col(v).mean
        case "min" => col(v).min; case "max" => col(v).max
        case "count" => col(v).count; case "n_unique" => col(v).nUnique
        case "first" => col(v).first; case "last" => col(v).last
      }).alias("out")).sortBy(Seq(col(key)))
  }

  // ---- comparison ----
  private def norm(v: Any): Any = v match {
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case f: java.lang.Float => f.doubleValue()
    case d: java.math.BigDecimal => d.doubleValue()
    case other => other
  }
  private def cellEq(a: Any, b: Any): Boolean = (norm(a), norm(b)) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(math.abs(x), math.abs(y))
    case (x: Double, y: Long) => x == y.toDouble
    case (x: Long, y: Double) => x.toDouble == y
    case (x, y) => x == y
  }

  private def diffReport(m: MFrame, got: Seq[Seq[Any]], gotCols: Seq[String]): Option[String] = {
    if (gotCols != m.names) return Some(s"schema: got $gotCols, want ${m.names}")
    if (got.size != m.rows.size) return Some(s"rows: got ${got.size}, want ${m.rows.size}\n" +
      s"got:  ${got.map(_.mkString(",")).mkString(" | ")}\nwant: ${m.rows.map(_.mkString(",")).mkString(" | ")}")
    got.zip(m.rows).zipWithIndex.collectFirst {
      case ((g, w), r) if !g.zip(w).forall { case (a, b) => cellEq(a, b) } =>
        s"row $r: got ${g.mkString(",")}, want ${w.mkString(",")}\n" +
          s"full got:  ${got.map(_.mkString(",")).mkString(" | ")}\n" +
          s"full want: ${m.rows.map(_.mkString(",")).mkString(" | ")}"
    }
  }

  /** Run one case; None = match, Some(report) = divergence.
    *
    * Scan-kernel ops (shift/cum/diff) re-read their upstream lineage for the
    * partials branch, so STACKING them through separate withColumn calls
    * fans the physical plan out exponentially (the engine docs this: cache
    * between kernel ops on expensive upstreams). A fuzz case chaining 3-4
    * of them over an uncached 3-partition literal generated ~200 stages —
    * the whole 600-seed suite ran 120k+ stages and crawled. Cache after
    * each scan op (and drop the cache per case): correctness coverage is
    * unchanged and each case costs a handful of jobs. */
  private def runCase(m0: MFrame, ops: Seq[Op]): Option[String] = {
    val want = Fuzz.run(m0, ops)
    val cached = collection.mutable.Buffer[org.apache.spark.sql.DataFrame]()
    try {
      val gdf = ops.foldLeft(toSpark(m0)) { (df, op) =>
        val next = applyOp(df, op)
        op match {
          case _: ShiftOp | _: CumOp | _: DiffOp =>
            val s = next.toSpark.cache(); cached += s; DataFrame(s)
          case _ => next
        }
      }
      val out = gdf.toSpark
      val got = out.collect().toSeq.map(_.toSeq)
      diffReport(want, got, out.columns.toSeq)
    } finally cached.foreach(_.unpersist(false))
  }

  /** Greedy shrink: drop ops (keeping a failing subset), then drop rows. */
  private def shrink(m0: MFrame, ops0: Seq[Op]): (MFrame, Seq[Op], String) = {
    var m = m0; var ops = ops0
    var report = runCase(m, ops).getOrElse(return (m, ops, "unshrinkable (flaky?)"))
    var changed = true
    while (changed) {
      changed = false
      // try dropping each op (skip ones whose outputs later ops reference —
      // a run that throws just doesn't shrink that way)
      for (i <- ops.indices if !changed) {
        val cand = ops.patch(i, Nil, 1)
        val r = try runCase(m, cand) catch { case _: Throwable => None }
        if (r.isDefined) { ops = cand; report = r.get; changed = true }
      }
      // try halving rows, then dropping single rows
      for (drop <- Seq(m.rows.size / 2, 1) if !changed && m.rows.nonEmpty) {
        val fronts = Seq(m.copy(rows = m.rows.drop(drop)), m.copy(rows = m.rows.dropRight(drop)))
        fronts.find(c => (try runCase(c, ops) catch { case _: Throwable => None }).isDefined)
          .foreach { c => m = c; report = runCase(c, ops).get; changed = true }
      }
    }
    (m, ops, report)
  }

  private def runSeeds(from: Int, until: Int): Unit = {
    // hundreds of micro-pipelines: AQE's per-exchange jobs and the default
    // shuffle parallelism are pure scheduling overhead at 25-row scale (a
    // 100-seed block ran ~20k stages with AQE on, ~3x fewer off). Restored
    // after the block — suites share the session but run sequentially.
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val parts = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "3")
    try runSeedsInner(from, until) finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.shuffle.partitions", parts)
    }
  }

  private def runSeedsInner(from: Int, until: Int): Unit = {
    val failures = Vector.newBuilder[String]
    for (seed <- from until until) {
      val rnd = new Random(seed)
      val m0 = genFrame(rnd)
      val ops = genOps(rnd, m0.schema)
      if (ops.nonEmpty) {
        val r = try runCase(m0, ops) catch {
          case e: Throwable => Some(s"THREW ${e.getClass.getSimpleName}: ${e.getMessage}\n" +
            e.getStackTrace.take(8).mkString("  at ", "\n  at ", ""))
        }
        r.foreach { rep0 =>
          val (sm, sops, rep) =
            if (rep0.startsWith("THREW")) (m0, ops, rep0)
            else shrink(m0, ops)
          failures += s"seed=$seed ops=${sops.mkString(" -> ")}\n" +
            s"frame(${sm.rows.size} rows): ${sm.schema.map(_._1).mkString(",")}\n" +
            sm.rows.take(12).map(_.mkString("[", ",", "]")).mkString(" ") + s"\n$rep"
        }
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"\n${fs.size} divergent case(s):\n\n${fs.mkString("\n\n---\n\n")}")
  }

  test("differential fuzz vs local reference model: seed 63 (r15 CCE regression)") { runSeeds(63, 64) }
  test("differential fuzz vs local reference model: seed 91 (r15 CCE regression)") { runSeeds(91, 92) }
  test("differential fuzz vs local reference model: seeds 0-99")    { runSeeds(0, 100) }
  test("differential fuzz vs local reference model: seeds 100-199") { runSeeds(100, 200) }
  test("differential fuzz vs local reference model: seeds 200-299") { runSeeds(200, 300) }
  test("differential fuzz vs local reference model: seeds 300-399") { runSeeds(300, 400) }
  test("differential fuzz vs local reference model: seeds 400-499") { runSeeds(400, 500) }
  test("differential fuzz vs local reference model: seeds 500-599") { runSeeds(500, 600) }
}
