"""imagharmony_tpu — TPU-native quantity-and-layout-consistent image editing.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
IMAGHarmony reference (quantity-and-layout-consistent "QL-Edit" on SDXL):
a decoupled image/text cross-attention adapter, a Harmony-Aware fusion
module, Perceiver resampler variants, a jitted SDXL denoising pipeline,
preference-guided noise selection (PNS), and an adapter fine-tuning loop —
all designed TPU-first (static shapes, lax.scan loops, mesh sharding,
Pallas kernels for the hot attention ops).

Layer map (mirrors SURVEY.md §7):
  nn/          pure functional layers (param pytrees, no framework magic)
  kernels/     Pallas TPU kernels (flash attention, fused decoupled IP attn)
  models/      SDXL UNet, VAE, CLIP text x2, CLIP vision, BPE tokenizer
  adapters/    IP-Adapter projections, Resampler, HarmonyAttention fusion
  schedulers/  DDPM / DDIM / Euler (stateless, scan-friendly)
  pipelines/   edit() API, PNS, batched serving
  train/       jitted train step, dataset, orbax checkpoints
  parallel/    device mesh + sharding helpers
  io/          torch-free checkpoint ingestion (safetensors, zip-pickle)
"""

__version__ = "0.1.0"
