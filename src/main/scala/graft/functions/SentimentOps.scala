package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Spark bindings for the VADER engine (P1/P2).
  *
  * A Scala UDF (not a Python UDF — no serialization boundary, runs inside
  * the executor JVM). It breaks whole-stage codegen locally, which is the
  * accepted cost for a rule engine this shape; the surrounding pipeline
  * stages stay codegen'd. Returns a struct matching the reference's
  * sentiment dict {negative, neutral, positive, compound}
  * (reddit_consumer.py:83-88).
  */
object SentimentOps {
  private val vaderUdf = udf { (text: String) =>
    Vader.polarityScores(if (text == null) "" else text)
  }

  /** str → struct<negative,neutral,positive,compound> */
  def vader(c: Column): Column = vaderUdf(c)
}
