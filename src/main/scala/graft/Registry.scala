package graft

/** Single assembly point for every verifiable query (SURVEY.md §2). */
object Registry {
  def all: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Windowed.all ++
      graft.queries.Grouping.all ++
      graft.queries.Joins.all ++
      graft.queries.Funnel.all ++
      graft.queries.Churn.all ++
      graft.queries.Engagement.all ++
      graft.queries.CatalogGap.all ++
      graft.queries.Seasonal.all ++
      graft.queries.Binge.all ++
      graft.queries.Subscription.all ++
      graft.queries.Ltv.all ++
      graft.queries.Geo.all ++
      graft.queries.CostOpt.all ++
      graft.queries.Cohort.all ++
      graft.queries.CrossPlatform.all ++
      graft.queries.Affinity.all ++
      graft.queries.Reco.all ++
      graft.queries.Virality.all ++
      graft.queries.Competitive.all ++
      graft.queries.Roi.all ++
      graft.queries.Personalization.all ++
      graft.queries.AbTest.all ++
      graft.queries.Predictive.all ++
      graft.queries.Family.all ++
      graft.queries.Text.all ++
      graft.queries.Dedup.all ++
      graft.queries.Ann.all ++
      graft.queries.Multimodal.all ++
      graft.queries.Streaming.all ++
      graft.queries.Bucketed.all ++
      graft.queries.Quality.all ++
      graft.queries.Contamination.all ++
      graft.queries.Scd2.all ++
      graft.queries.Pii.all ++
      graft.queries.Compaction.all ++
      graft.queries.DataQuality.all ++
      graft.queries.Cdc.all ++
      graft.queries.LmScore.all ++
      graft.queries.Incremental.all ++
      graft.queries.Retrieval.all ++
      graft.queries.ZOrder.all ++
      graft.queries.GapFill.all ++
      graft.queries.MultiQuery.all ++
      graft.queries.SetOps.all ++
      graft.queries.Profile.all ++
      graft.queries.Json.all ++
      graft.queries.Pit.all ++
      graft.queries.Semantic.all ++
      graft.queries.Boilerplate.all ++
      graft.queries.Classifier.all ++
      graft.queries.Graph.all ++
      graft.queries.Tokenize.all ++
      graft.queries.Orc.all ++
      graft.queries.Pipeline.all ++
      graft.queries.SqlSurface.all ++
      graft.queries.SchemaDrift.all ++
      graft.queries.SeqPattern.all ++
      graft.queries.Winsorize.all ++
      graft.queries.Chunking.all ++
      graft.queries.Collocation.all ++
      graft.queries.NodeSim.all ++
      graft.queries.Dsir.all ++
      graft.queries.Regression.all ++
      graft.queries.Drift.all ++
      graft.queries.CompressionQuality.all ++
      graft.queries.FuzzyMatch.all ++
      graft.queries.Concurrency.all ++
      graft.queries.KAnonymity.all ++
      graft.queries.Ewma.all ++
      graft.queries.PrefixJoin.all ++
      graft.queries.Changepoint.all ++
      graft.queries.Markov.all ++
      graft.queries.Melt.all ++
      graft.queries.Basket.all ++
      graft.queries.Survival.all ++
      graft.queries.Benford.all ++
      graft.queries.Twap.all ++
      graft.queries.Acf.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
