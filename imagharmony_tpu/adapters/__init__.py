from imagharmony_tpu.adapters import harmony, projections, resampler

__all__ = ["projections", "resampler", "harmony"]
