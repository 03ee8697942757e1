"""SoundStream-style mel autoencoder with VQ bottleneck.

Parity target: ``/root/reference/models/speech/soundstream.py`` (a dead
path in the reference — its trainer exists but the codec wrapper import
crashes; kept functional here for completeness).
"""
from __future__ import annotations

from typing import Dict, Optional

from flax import nnx

from ...core.masked import Masked
from ...hparams.hp import Hparams
from ...nn.conv import BottleNeckResNet
from ...nn.vq import get_vector_quantizer


class SoundStream(nnx.Module):
    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("encoder", "decoder", "quantizer")
        self.hp = hp
        self.encoder = BottleNeckResNet(hp.encoder, input_dim=input_dim,
                                        output_dim=hp.quantizer.dim,
                                        rngs=rngs)
        self.quantizer = get_vector_quantizer(hp.quantizer, rngs=rngs)
        self.decoder = BottleNeckResNet(hp.decoder,
                                        input_dim=hp.quantizer.dim,
                                        output_dim=input_dim, rngs=rngs)

    @property
    def sample_ratio(self) -> float:
        return self.encoder.sample_ratio

    def __call__(self, x: Masked) -> Dict[str, object]:
        z = self.encoder(x)
        vq = self.quantizer(z)
        rec = self.decoder(vq.quantized)
        return {"reconstruction": rec, "aux_loss": vq.loss}
