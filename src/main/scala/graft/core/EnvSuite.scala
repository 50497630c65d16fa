package graft.core

/** Env-var suite scoping shared by the measurement mains (Bench's
  * SPARK_GRAFT_SCALE_SUITE, StreamScale's SPARK_GRAFT_STREAM_SUITE —
  * round-12 review: two hand-maintained copies of the same parse/
  * partition/warn block had already shipped). Contract: csv of query
  * names; unknown names are dropped LOUDLY to stderr, never run and
  * never silently kept; an unset var means the caller's full default
  * suite. */
object EnvSuite {
  def scope(envVar: String, default: Seq[String], isKnown: String => Boolean,
      tag: String): Seq[String] =
    sys.env.get(envVar) match {
      case None => default
      case Some(csv) =>
        val asked = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val (known, unknown) = asked.partition(isKnown)
        if (unknown.nonEmpty)
          System.err.println(
            s"[$tag] $envVar names not recognized, skipped: " +
              unknown.mkString(","))
        known
    }
}
