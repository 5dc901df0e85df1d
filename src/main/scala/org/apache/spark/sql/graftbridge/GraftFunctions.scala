package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for graft's native expressions, so a
  * pure-SQL user gets the codegen'd kernels:
  *
  *   SELECT minhash_sig(text, 128, 5, 42), simhash64(text, 5),
  *          float_dot(a, b), match_count_long(sa, sb),
  *          sorted_intersect_count(sh_a, sh_b), string_split(s, sep)
  *
  * Two entry points, same builders:
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=org.apache.spark.sql.graftbridge.GraftExtensions`
  *    (the idiomatic library packaging: every session on the cluster
  *    gets the functions at startup);
  *  - [[GraftFunctions.register]] — imperative registration on an
  *    existing session (tests, notebooks).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  /** (name, builder) for every graft SQL function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> { args =>
      require(args.length == 4, "minhash_sig(text, numHashes, shingleK, seed)")
      MinHashSig(args(0), intLit(args(1), "numHashes"),
        intLit(args(2), "shingleK"), longLit(args(3), "seed"))
    },
    "simhash64" -> { args =>
      require(args.length == 2, "simhash64(text, shingleK)")
      SimHash64(args(0), intLit(args(1), "shingleK"))
    },
    "shingle_set" -> { args =>
      require(args.length == 2, "shingle_set(text, shingleK)")
      ShingleSet(args(0), intLit(args(1), "shingleK"))
    },
    "float_dot" -> { args =>
      require(args.length == 2, "float_dot(a, b)")
      FloatDotProduct(args(0), args(1))
    },
    "match_count_long" -> { args =>
      require(args.length == 2, "match_count_long(a, b)")
      LongArrayMatchCount(args(0), args(1))
    },
    "sorted_intersect_count" -> { args =>
      require(args.length == 2, "sorted_intersect_count(a, b)")
      SortedLongArrayIntersectCount(args(0), args(1))
    },
    "string_split" -> { args =>
      require(args.length == 2, "string_split(s, sep)")
      org.apache.spark.sql.catalyst.expressions.StringSplit(args(0), args(1), Literal(-1))
    },
    "bounded_collect_list" -> { args =>
      require(args.length == 2, "bounded_collect_list(expr, limit)")
      BoundedCollectList(args(0), intLit(args(1), "limit")).toAggregateExpression()
    },
    "space_saving_topk" -> { args =>
      require(args.length == 2, "space_saving_topk(expr, capacity)")
      SpaceSavingTopK(args(0), intLit(args(1), "capacity")).toAggregateExpression()
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** `spark.sql.extensions` injector: permanent, catalog-visible
  * registration of the graft SQL functions for every session built
  * with these extensions, plus the opt-in [[RangeJoinBucketing]]
  * optimizer rule (active only when
  * `spark.graft.rangeJoin.bucketWidth` is set).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
    ext.injectOptimizerRule(session => RangeJoinBucketing(session))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectParser((session, delegate) => new GraftSqlParser(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], delegate))
  }
}

