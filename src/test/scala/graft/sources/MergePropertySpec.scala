package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random MERGE INTO equivalence: random clause lists (ordered
  * conditional updates/deletes + a gated insert) run through
  * [[Versioned.merge]] and, independently, through a DRIVER-SIDE
  * interpreter over collected rows — two implementations that share
  * nothing but the spec. The house seeded-random idiom (the skipping
  * planner's predicate spec); failures print the seed round.
  */
/** (id, kind, v) — a tiny keyed table with enough collision structure.
  * Top-level: Dataset encoders cannot reach a suite-inner class.
  */
case class MergePropRow(id: Long, kind: String, v: Double)

class MergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type R = MergePropRow
  private def R(id: Long, kind: String, v: Double) = MergePropRow(id, kind, v)

  private sealed trait Cond
  private case object Always extends Cond
  private case class SValGt(c: Double) extends Cond
  private case class TValLe(c: Double) extends Cond
  private case class KindIs(k: String) extends Cond

  private def evalCond(c: Cond, t: R, s: R): Boolean = c match {
    case Always => true
    case SValGt(x) => s.v > x
    case TValLe(x) => t.v <= x
    case KindIs(k) => s.kind == k
  }

  private sealed trait Act
  private case class Del(cond: Cond) extends Act
  // partial SET: optionally set v (to s.v + dv) and/or kind (literal)
  private case class Upd(cond: Cond, dv: Option[Double],
      kind: Option[String]) extends Act

  private def toCol(c: Cond): Option[org.apache.spark.sql.Column] = c match {
    case Always => None
    case SValGt(x) => Some(col("s.v") > x)
    case TValLe(x) => Some(col("t.v") <= x)
    case KindIs(k) => Some(col("s.kind") === k)
  }

  test("40 seeded random clause lists: merge == driver-side interpreter") {
    val rnd = new scala.util.Random(20260816L)
    val kinds = Seq("a", "b", "c", "d")
    for (round <- 1 to 40) {
      val hint = s"round $round"
      val n = 40 + rnd.nextInt(60)
      val target = (0 until n).map(i =>
        R(i.toLong, kinds(rnd.nextInt(kinds.length)),
          math.rint(rnd.nextDouble() * 100)))
      // source: some matched keys (transformed), some brand-new keys
      val matchedKeys = rnd.shuffle(target.map(_.id))
        .take(rnd.nextInt(n / 2) + 1)
      val src = matchedKeys.map(id =>
        R(id, kinds(rnd.nextInt(kinds.length)),
          math.rint(rnd.nextDouble() * 100))) ++
        (0 until rnd.nextInt(10)).map(i =>
          R(1000L + i, kinds(rnd.nextInt(kinds.length)),
            math.rint(rnd.nextDouble() * 100)))
      def randCond(): Cond = rnd.nextInt(4) match {
        case 0 => Always
        case 1 => SValGt(math.rint(rnd.nextDouble() * 100))
        case 2 => TValLe(math.rint(rnd.nextDouble() * 100))
        case 3 => KindIs(kinds(rnd.nextInt(kinds.length)))
      }
      val acts: Seq[Act] = (0 until (1 + rnd.nextInt(3))).map { _ =>
        if (rnd.nextBoolean()) Del(randCond())
        else Upd(randCond(),
          if (rnd.nextBoolean()) Some(math.rint(rnd.nextDouble() * 10))
          else None,
          if (rnd.nextBoolean()) Some("upd") else None)
      }
      val insert = rnd.nextBoolean()
      val insertCond: Option[Cond] =
        if (insert && rnd.nextBoolean()) Some(SValGt(50)) else None

      // engine side
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("mprop")
        .toString + "/t"
      Versioned.append(target.toDF().repartition(3), dir)
      val matched = acts.map {
        case Del(c) => Versioned.WhenMatchedDelete(toCol(c))
        case Upd(c, dv, k) => Versioned.WhenMatchedUpdate(
          (dv.map(d => "v" -> (col("s.v") + lit(d))).toSeq ++
            k.map(x => "kind" -> (lit(x): org.apache.spark.sql.Column))
              .toSeq).toMap,
          toCol(c))
      }
      Versioned.merge(src.toDF(), dir, Seq("id"), matched,
        insertNotMatched = insert,
        insertCond = insertCond.map {
          case SValGt(x) => col("v") > x
          case _ => lit(true)
        })
      val got = Versioned.read(spark, dir).as[MergePropRow].collect()
        .sortBy(r => (r.id, r.kind, r.v))

      // independent driver-side interpreter
      val byKey = src.map(r => r.id -> r).toMap
      val kept = target.flatMap { t =>
        byKey.get(t.id) match {
          case None => Some(t)
          case Some(s) =>
            acts.find {
              case Del(c) => evalCond(c, t, s)
              case Upd(c, _, _) => evalCond(c, t, s)
            } match {
              case Some(Del(_)) => None
              case Some(Upd(_, dv, k)) => Some(R(t.id,
                k.getOrElse(t.kind), dv.map(_ + s.v).getOrElse(t.v)))
              case None => Some(t)
            }
        }
      }
      val inserts =
        if (!insert) Seq.empty
        else src.filterNot(s => target.exists(_.id == s.id))
          .filter(s => insertCond.forall {
            case SValGt(x) => s.v > x
            case _ => true
          })
      val want = (kept ++ inserts).sortBy(r => (r.id, r.kind, r.v))
      assert(got.toSeq == want,
        s"$hint: merge != interpreter\nacts=$acts insert=$insert " +
          s"cond=$insertCond\ngot ${got.toSeq}\nwant $want")
    }
  }
}
