from imagharmony_tpu.models import clip_text, clip_vision, tokenizer, unet, vae

__all__ = ["unet", "vae", "clip_text", "clip_vision", "tokenizer"]
