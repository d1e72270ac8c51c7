package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random SQL `MERGE INTO` equivalence — the MergePropertySpec
  * idiom pointed at the OTHER implementation: each round's random
  * ordered clause list runs through Spark's own MergeRows rewrite over
  * [[GraftRowLevelOperation]] (the SQL path: group-based copy-on-write
  * with runtime group filtering) and, independently, through the same
  * driver-side interpreter — so the SQL statement, the engine's rewrite
  * plan, the distributed V2 write, and the commit protocol are all on
  * the hook, not just the clause algebra. Failures print the seed round
  * and clause list.
  *
  * The clause space covers all THREE Spark 4 families: WHEN MATCHED
  * (update/delete, conditional), WHEN NOT MATCHED (insert, conditional),
  * and WHEN NOT MATCHED BY SOURCE (update/delete over target rows with
  * no source match — conditions/SETs reference the target alone). The
  * by-source family is the one that interacts dangerously with runtime
  * group filtering (its rewrites live in files with NO matching rows);
  * [[SqlMergeBySourceProbe]] pins the deterministic cases, this spec
  * fuzzes the composition.
  */
class SqlMergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type R = MergePropRow
  private def R(id: Long, kind: String, v: Double) = MergePropRow(id, kind, v)

  private sealed trait Cond
  private case object Always extends Cond
  private case class SValGt(c: Double) extends Cond
  private case class TValLe(c: Double) extends Cond
  private case class KindIs(k: String) extends Cond
  private case class TKindIs(k: String) extends Cond

  private def evalCond(c: Cond, t: R, s: R): Boolean = c match {
    case Always => true
    case SValGt(x) => s.v > x
    case TValLe(x) => t.v <= x
    case KindIs(k) => s.kind == k
    case TKindIs(k) => t.kind == k
  }

  /** Target-only condition evaluation (the BY SOURCE clause space — no
    * source row exists for these target rows).
    */
  private def evalTCond(c: Cond, t: R): Boolean = c match {
    case Always => true
    case TValLe(x) => t.v <= x
    case TKindIs(k) => t.kind == k
    case other => throw new IllegalStateException(
      s"source-referencing cond $other in a BY SOURCE clause")
  }

  private def condSql(c: Cond): Option[String] = c match {
    case Always => None
    case SValGt(x) => Some(s"s.v > $x")
    case TValLe(x) => Some(s"t.v <= $x")
    case KindIs(k) => Some(s"s.kind = '$k'")
    case TKindIs(k) => Some(s"t.kind = '$k'")
  }

  private sealed trait Act
  private case class Del(cond: Cond) extends Act
  private case class Upd(cond: Cond, dv: Option[Double],
      kind: Option[String]) extends Act
  /** WHEN NOT MATCHED BY SOURCE THEN DELETE — target-only condition. */
  private case class BsDel(cond: Cond) extends Act
  /** WHEN NOT MATCHED BY SOURCE THEN UPDATE — target-only condition and
    * SET expressions (v = t.v + dv / kind = const).
    */
  private case class BsUpd(cond: Cond, dv: Option[Double],
      kind: Option[String]) extends Act

  test("20 seeded random clause lists: SQL MERGE INTO == driver-side " +
      "interpreter") {
    val wh = java.nio.file.Files.createTempDirectory("sqlmprop").toString
    spark.conf.set("spark.sql.catalog.smp",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.smp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS smp.ns")

    val rnd = new scala.util.Random(20260817L)
    val kinds = Seq("a", "b", "c", "d")
    for (round <- 1 to 20) {
      val hint = s"round $round"
      val n = 40 + rnd.nextInt(60)
      val target = (0 until n).map(i =>
        R(i.toLong, kinds(rnd.nextInt(kinds.length)),
          math.rint(rnd.nextDouble() * 100)))
      val matchedKeys = rnd.shuffle(target.map(_.id))
        .take(rnd.nextInt(n / 2) + 1)
      val src = matchedKeys.map(id =>
        R(id, kinds(rnd.nextInt(kinds.length)),
          math.rint(rnd.nextDouble() * 100))) ++
        (0 until rnd.nextInt(10)).map(i =>
          R(1000L + i, kinds(rnd.nextInt(kinds.length)),
            math.rint(rnd.nextDouble() * 100)))
      def randCond(): Cond = rnd.nextInt(5) match {
        case 0 => Always
        case 1 => SValGt(math.rint(rnd.nextDouble() * 100))
        case 2 => TValLe(math.rint(rnd.nextDouble() * 100))
        case 3 => KindIs(kinds(rnd.nextInt(kinds.length)))
        case 4 => TKindIs(kinds(rnd.nextInt(kinds.length)))
      }
      // target-only conditions for the BY SOURCE clause family
      def randTCond(): Cond = rnd.nextInt(3) match {
        case 0 => Always
        case 1 => TValLe(math.rint(rnd.nextDouble() * 100))
        case 2 => TKindIs(kinds(rnd.nextInt(kinds.length)))
      }
      // SQL grammar rule: only the LAST clause of a family may omit its
      // condition (an unconditional mid-list clause would shadow the
      // rest anyway), so non-last positions draw non-Always conditions
      def nonAlways(g: () => Cond): Cond = {
        var c = g()
        while (c == Always) c = g()
        c
      }
      val nActs = 1 + rnd.nextInt(3)
      val acts: Seq[Act] = (0 until nActs).map { i =>
        val c = if (i == nActs - 1) randCond() else nonAlways(randCond _)
        if (rnd.nextBoolean()) Del(c)
        else Upd(c,
          if (rnd.nextBoolean()) Some(math.rint(rnd.nextDouble() * 10))
          else None,
          if (rnd.nextBoolean()) Some("upd") else None)
      }
      val nBs = rnd.nextInt(3) // 0 = no by-source family this round
      val bsActs: Seq[Act] = (0 until nBs).map { i =>
        val c = if (i == nBs - 1) randTCond() else nonAlways(randTCond _)
        if (rnd.nextBoolean()) BsDel(c)
        else BsUpd(c,
          if (rnd.nextBoolean()) Some(math.rint(rnd.nextDouble() * 10))
          else None,
          if (rnd.nextBoolean()) Some("bys") else None)
      }
      val insert = rnd.nextBoolean()
      val insertCond: Option[Cond] =
        if (insert && rnd.nextBoolean()) Some(SValGt(50)) else None

      // SQL side: real catalog table, real MERGE INTO statement
      import spark.implicits._
      val name = s"t_$round"
      val t = s"smp.ns.$name"
      val dir = s"$wh/ns/$name"
      Versioned.append(target.toDF().repartition(3), dir)
      src.toDF().createOrReplaceTempView("smp_src")
      val matchedSql = acts.map {
        case Del(c) =>
          "WHEN MATCHED" + condSql(c).map(" AND " + _).getOrElse("") +
            " THEN DELETE"
        case Upd(c, dv, k) =>
          val sets = dv.map(d => s"v = s.v + $d").toSeq ++
            k.map(x => s"kind = '$x'").toSeq
          val setsSql = if (sets.isEmpty) "v = t.v" else sets.mkString(", ")
          "WHEN MATCHED" + condSql(c).map(" AND " + _).getOrElse("") +
            s" THEN UPDATE SET $setsSql"
        case other => throw new IllegalStateException(s"matched: $other")
      }.mkString(" ")
      val bySourceSql = bsActs.map {
        case BsDel(c) =>
          "WHEN NOT MATCHED BY SOURCE" +
            condSql(c).map(" AND " + _).getOrElse("") + " THEN DELETE"
        case BsUpd(c, dv, k) =>
          val sets = dv.map(d => s"v = t.v + $d").toSeq ++
            k.map(x => s"kind = '$x'").toSeq
          val setsSql = if (sets.isEmpty) "v = t.v" else sets.mkString(", ")
          "WHEN NOT MATCHED BY SOURCE" +
            condSql(c).map(" AND " + _).getOrElse("") +
            s" THEN UPDATE SET $setsSql"
        case other => throw new IllegalStateException(s"by-source: $other")
      }.mkString(" ")
      val insertSql =
        if (!insert) ""
        else "WHEN NOT MATCHED" +
          insertCond.flatMap(condSql).map(" AND " + _).getOrElse("") +
          " THEN INSERT *"
      // Spark requires at least one clause besides by-source? No — a
      // by-source-only merge is legal; but an EMPTY clause list is not,
      // and acts is always non-empty here.
      spark.sql(s"MERGE INTO $t t USING smp_src s ON t.id = s.id " +
        s"$matchedSql $insertSql $bySourceSql")
      val got = spark.sql(s"SELECT * FROM $t").as[MergePropRow]
        .collect().sortBy(r => (r.id, r.kind, r.v))

      // independent driver-side interpreter (MergePropertySpec's)
      val byKey = src.map(r => r.id -> r).toMap
      val kept = target.flatMap { tr =>
        byKey.get(tr.id) match {
          case None =>
            // NOT MATCHED BY SOURCE: first true clause wins; none -> carry
            bsActs.find {
              case BsDel(c) => evalTCond(c, tr)
              case BsUpd(c, _, _) => evalTCond(c, tr)
              case _ => false
            } match {
              case Some(BsDel(_)) => None
              case Some(BsUpd(_, dv, k)) => Some(R(tr.id,
                k.getOrElse(tr.kind), dv.map(_ + tr.v).getOrElse(tr.v)))
              case _ => Some(tr)
            }
          case Some(s) =>
            acts.find {
              case Del(c) => evalCond(c, tr, s)
              case Upd(c, _, _) => evalCond(c, tr, s)
              case _ => false
            } match {
              case Some(Del(_)) => None
              case Some(Upd(_, dv, k)) => Some(R(tr.id,
                k.getOrElse(tr.kind), dv.map(_ + s.v).getOrElse(tr.v)))
              case _ => Some(tr)
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
        s"$hint: SQL MERGE != interpreter\nacts=$acts bs=$bsActs " +
          s"insert=$insert cond=$insertCond\ngot ${got.toSeq}\nwant $want")
    }
  }
}
