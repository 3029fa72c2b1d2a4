package graft.queries

/** The full declared query inventory (SURVEY §2.13 + extensions).
  * `SparkEntry` derives its `queries`/`oracleSql` maps from `all`. */
object Inventory {
  def all: Seq[Query] =
    RelationalQueries.all ++ EventQueries.all ++ PipelineQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      TemporalQueries.all ++ AggregatorQueries.all ++ ExtraQueries.all ++
      RelationalQueries2.all ++ CoverageQueries.all ++
      CurationQueries.all ++ RetrievalQueries.all

  def byName: Map[String, Query] = all.map(q => q.name -> q).toMap
}
