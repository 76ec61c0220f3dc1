from promptir_tpu.serve.engine import InferenceEngine

__all__ = ["InferenceEngine"]
