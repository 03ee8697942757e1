"""LVTTS — TTS variant of LVTR with text cross-attention.

Parity target: ``/root/reference/models/tts/lvtr.py``: text embedding +
transformer encoder as cross-attention memory, speaker
BottleNeckResNet + TimeAggregation embedding, EOS LinearLayerStack head.
(The reference defines a ``spkr_film`` that is never applied in its
forward — we keep the module for checkpoint-shape parity but likewise
do not apply it.)
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.masked import Masked
from ...data.symbols import Symbols
from ...hparams.hp import Hparams
from ...nn.conv import BottleNeckResNet
from ...nn.linear import Embedding, FiLM, LinearLayerStack, TimeAggregation
from ...nn.transformer import TransformerLayerStack
from ..speech.lvtr import LVTR

Array = jax.Array


class LVTTS(LVTR):
    def __init__(self, hp: Hparams, symbols: Symbols,
                 input_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("text")
        hp.text.check_arg_in_hparams("embedding_dim", "encoder")
        hp.check_arg_in_hparams("eos", "spkr")
        hp.spkr.check_arg_in_hparams("embedding_dim")
        hp.transformer.layer.check_arg_in_hparams("cross_attn")
        super().__init__(hp, input_dim,
                         memory_dim=hp.text.encoder.layer.dim, rngs=rngs)
        self.pad_idx = symbols.pad_idx
        self.text_embedding = Embedding(symbols.num_symbols,
                                        hp.text.embedding_dim, rngs=rngs)
        # padding_idx semantics: zero the pad row.
        self.text_embedding.table[...] = \
            self.text_embedding.table[...].at[symbols.pad_idx].set(0.0)
        self.text_encoder = TransformerLayerStack(
            hp.text.encoder, input_dim=hp.text.embedding_dim, rngs=rngs)
        self.eos_head = LinearLayerStack(
            hp.eos, input_dim=hp.transformer.layer.dim, output_dim=1,
            rngs=rngs)
        self.spkr_encoder = BottleNeckResNet(
            hp.spkr, input_dim=input_dim,
            output_dim=hp.spkr.embedding_dim, rngs=rngs)
        self.spkr_pool = TimeAggregation()
        self.spkr_film = FiLM(hp.transformer.layer.dim, bias=False,
                              time_first=True,
                              in_dim=hp.spkr.embedding_dim, rngs=rngs)

    def encode_condition(self, text: Masked, spkr: Masked,
                         return_attn: bool = False):
        """Text memory + pooled speaker embedding
        (``models/tts/lvtr.py:60-75``).  With ``return_attn`` a third
        element — the text-encoder self-attention maps stacked over
        layers (L, B, H, T, T) — is returned
        (``trainers/tts/sampler.py:23-30`` parity)."""
        spkr_emb = self.spkr_pool(self.spkr_encoder(spkr))
        if return_attn:
            res = self.text_encoder.run(self.text_embedding(text),
                                        return_attn=True)
            text_attn = jnp.stack(res["self_attn"])
            return res["output"], spkr_emb, text_attn
        memory = self.text_encoder(self.text_embedding(text))
        return memory, spkr_emb

    def __call__(self, x: Masked, key: Array, text: Masked = None,
                 spkr: Masked = None, **kwargs) -> Dict[str, Any]:
        memory, spkr_emb = self.encode_condition(text, spkr)
        output = super().__call__(x, key, c=memory, **kwargs)
        eos = self.eos_head(output["transformer_latent"])
        output["eos"] = eos.squeeze(-1)
        output["condition"] = memory
        return output

    def is_eos(self, latent: Masked, threshold: float = 0.5) -> Array:
        eos = self.eos_head(latent).squeeze(-1)
        return jax.nn.sigmoid(eos.value.astype(jnp.float32)) > threshold
