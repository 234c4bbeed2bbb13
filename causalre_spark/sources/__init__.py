from causalre_spark.sources.corpus import PAGES_SCHEMA, gen_page, synth_pages_df  # noqa: F401
