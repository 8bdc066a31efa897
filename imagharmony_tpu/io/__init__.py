from imagharmony_tpu.io import checkpoints, hf_import, safetensors_io, torch_pickle

__all__ = ["checkpoints", "hf_import", "safetensors_io", "torch_pickle"]
