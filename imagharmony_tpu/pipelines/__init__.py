from imagharmony_tpu.pipelines import components
from imagharmony_tpu.pipelines.harmony_edit import EditOptions, HarmonyPipeline

__all__ = ["components", "HarmonyPipeline", "EditOptions"]
