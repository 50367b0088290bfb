"""Model families: CLIP (vision+text), LLaMA/Vicuna, MPT, LLaVA-1.5,
OpenFlamingo — pure functional param-tree models with torch/HF weight
import and shared KV-cache generation."""
