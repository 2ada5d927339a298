package graft

/** All registered queries, in stable declaration order. */
object Registry {
  def all: Seq[(String, Q)] =
    RefQueries.defs ++ JsonQueries.defs ++ CsvQueries.defs ++ DataQueries.defs ++
      TemporalQueries.defs ++ EtlQueries.defs ++ FormatQueries.defs ++
      IndexQueries.defs ++ MediaQueries.defs ++ TrainQueries.defs :+
      ("ref_e2e_monthly_report" ->
        Q(Pipeline.monthlyReport, Some(Pipeline.oracle), headline = true))

  def byName: Map[String, Q] = all.toMap

  def headlines: Seq[(String, Q)] = all.filter(_._2.headline)
}
