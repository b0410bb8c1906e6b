package graft.queries

/** Central registry of every operator query exposed through
  * [[graft.SparkEntry]]. Each family file contributes a `Seq[Q]`;
  * names must be unique (asserted at class-load so a collision fails
  * fast in `sbt test`, not silently in the driver). */
object Registry {
  def families: Seq[Seq[Q]] = Seq(
    AggQueries.all,
    AggExtraQueries.all,
    IoQueries.all,
    JoinQueries.all,
    SortQueries.all,
    ExtrasQueries.all,
    WindowQueries.all,
    WindowExtraQueries.all,
    SelectQueries.all,
    StringDateQueries.all,
    ReshapeQueries.all,
    ReshapeExtraQueries.all,
    ResampleQueries.all,
    ResampleExtraQueries.all,
    GroupByExtraQueries.all,
    MissingQueries.all,
    UdfQueries.all,
    PipelineQueries.all,
    CorpusQueries.all,
    StressQueries.all,
    StreamingQueries.all
  )

  lazy val all: Seq[Q] = {
    val qs = families.flatten
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    qs
  }
}
