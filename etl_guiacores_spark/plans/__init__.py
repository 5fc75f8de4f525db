from etl_guiacores_spark.plans.pipeline import PipelineConfig, clean_leads, run_batch_pipeline

__all__ = ["PipelineConfig", "clean_leads", "run_batch_pipeline"]
