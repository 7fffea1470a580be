from pandas_sigproc_spark.pipeline.fused import KernelPipeline

__all__ = ["KernelPipeline"]
