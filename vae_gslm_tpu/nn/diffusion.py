"""Gaussian diffusion (1-D) with scan-compiled samplers.

Parity target: ``/root/reference/modules/diffusion/ddpm.py``:
linear / scaled-linear / cosine beta schedules computed in float64 then
stored fp32, pred_noise/pred_x0 objectives, clamp range, ancestral
``p_sample_loop`` with stride, ``ddim_sample`` with eta, masked L1/L2
training loss on the noise, uniform random t per example.

TPU-first: both samplers are ``lax.scan`` over precomputed schedule
arrays — one compiled program regardless of step count, no host loop;
PRNG is threaded explicitly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.losses import masked_l1_loss, masked_l2_loss
from ..core.masked import Masked
from ..hparams.hp import Hparams

Array = jax.Array


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps,
                       dtype=np.float64)


def scaled_linear_beta_schedule(timesteps: int, hp: Hparams) -> np.ndarray:
    beta_start = hp.get("beta_start", 0.0015)
    beta_end = hp.get("beta_end", 0.0195)
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, timesteps,
                       dtype=np.float64) ** 2


def cosine_beta_schedule(timesteps: int, hp: Hparams) -> np.ndarray:
    s = hp.get("s", 0.008)
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """fp32 registered schedule buffers (``ddpm.py:186-218``)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    @classmethod
    def create(cls, betas: np.ndarray) -> "DiffusionSchedule":
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        f32 = lambda a: a.astype(np.float32)  # noqa: E731
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(ac),
            alphas_cumprod_prev=f32(ac_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1.0)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(
                np.log(np.clip(post_var, 1e-20, None))),
            posterior_mean_coef1=f32(
                betas * np.sqrt(ac_prev) / (1.0 - ac)),
            posterior_mean_coef2=f32(
                (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
        )


def _extract(buf: Array, t: Array, ndim: int) -> Array:
    out = buf[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


class GaussianDiffusion1D(nnx.Module):
    """Diffusion wrapper around a conditional denoiser model.

    ``model(x_t: Masked, t: (B,), cond: Masked) -> Masked``.
    """

    def __init__(self, model, hp: Hparams):
        self.hp = hp
        self.model = model
        timesteps = hp.timesteps
        self.loss_type = hp.get("loss_type", "l1")
        self.objective = hp.get("objective", "pred_noise")
        self.clamp_range = hp.get("clamp_range", [-1, 1])
        self.ddim_sampling_eta = hp.get("ddim_sampling_eta", 1.0)
        self.sigma = 1.0
        ident = hp.beta_schedule.identifier
        if ident == "linear":
            betas = linear_beta_schedule(timesteps)
        elif ident == "scaled_linear":
            betas = scaled_linear_beta_schedule(timesteps, hp.beta_schedule)
        elif ident == "cosine":
            betas = cosine_beta_schedule(timesteps, hp.beta_schedule)
        else:
            raise ValueError(f"unknown beta schedule {ident}")
        self.num_timesteps = int(betas.shape[0])
        self.sampling_timesteps = hp.get("sampling_timesteps",
                                         None) or self.num_timesteps
        assert self.sampling_timesteps <= self.num_timesteps
        sched = DiffusionSchedule.create(betas)
        # One stacked (n_buffers, T) non-trainable variable: cheap
        # pytree, trivially checkpointable.
        names = sorted(dataclasses.asdict(sched).keys())
        self._buf_idx = {n: i for i, n in enumerate(names)}
        self.schedule = nnx.Variable(jnp.stack(
            [jnp.asarray(getattr(sched, n)) for n in names]))

    # -- config overrides at inference (``speech/inferer.py:54-67``) ------
    def override_sampling(self, sampling_timesteps: Optional[int] = None,
                          ddim_sampling_eta: Optional[float] = None):
        if sampling_timesteps is not None:
            self.sampling_timesteps = sampling_timesteps
        if ddim_sampling_eta is not None:
            self.ddim_sampling_eta = ddim_sampling_eta

    @property
    def is_ddim_sampling(self) -> bool:
        return self.sampling_timesteps < self.num_timesteps

    def _buf(self, name: str) -> Array:
        return self.schedule[...][self._buf_idx[name]]

    # -- conversions -------------------------------------------------------
    def predict_start_from_noise(self, x_t: Array, t: Array,
                                 noise: Array) -> Array:
        nd = x_t.ndim
        return (_extract(self._buf("sqrt_recip_alphas_cumprod"), t, nd) * x_t
                - _extract(self._buf("sqrt_recipm1_alphas_cumprod"), t, nd)
                * noise)

    def predict_noise_from_start(self, x_t: Array, t: Array,
                                 x0: Array) -> Array:
        nd = x_t.ndim
        return ((_extract(self._buf("sqrt_recip_alphas_cumprod"), t, nd)
                 * x_t - x0)
                / _extract(self._buf("sqrt_recipm1_alphas_cumprod"), t, nd))

    def q_posterior(self, x_start: Array, x_t: Array, t: Array):
        nd = x_t.ndim
        mean = (_extract(self._buf("posterior_mean_coef1"), t, nd) * x_start
                + _extract(self._buf("posterior_mean_coef2"), t, nd) * x_t)
        var = _extract(self._buf("posterior_variance"), t, nd)
        logvar = _extract(self._buf("posterior_log_variance_clipped"), t, nd)
        return mean, var, logvar

    def model_predictions(self, x: Masked, t: Array, cond: Masked,
                          **kwargs) -> Tuple[Masked, Masked]:
        out = self.model(x, t, cond, **kwargs)
        xv = x.value.astype(jnp.float32)
        ov = out.value.astype(jnp.float32)
        if self.objective == "pred_noise":
            pred_noise = ov
            x_start = self.predict_start_from_noise(xv, t, ov)
        elif self.objective == "pred_x0":
            x_start = ov
            pred_noise = self.predict_noise_from_start(xv, t, ov)
        else:
            raise ValueError(self.objective)
        mk = lambda v: Masked(v, out.lengths, 1).apply_mask()  # noqa: E731
        return mk(pred_noise), mk(x_start)

    # -- training ----------------------------------------------------------
    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        nd = x_start.ndim
        return (_extract(self._buf("sqrt_alphas_cumprod"), t, nd) * x_start
                + _extract(self._buf("sqrt_one_minus_alphas_cumprod"), t, nd)
                * noise)

    @property
    def loss_fn(self) -> Callable:
        if self.loss_type == "l1":
            return masked_l1_loss
        if self.loss_type == "l2":
            return masked_l2_loss
        raise ValueError(f"invalid loss type {self.loss_type}")

    def p_losses(self, x_start: Masked, t: Array, cond: Masked,
                 key: jax.Array, loss_batch_weight=None, **kwargs) -> Array:
        noise = jax.random.normal(key, x_start.value.shape, jnp.float32)
        x = self.q_sample(x_start.value.astype(jnp.float32), t, noise)
        x = Masked(x, x_start.lengths, 1).apply_mask()
        model_out = self.model(x, t, cond, **kwargs)
        if self.objective == "pred_noise":
            target = Masked(noise, x_start.lengths, 1).apply_mask()
        else:
            target = x_start
        return self.loss_fn(model_out, target,
                            batch_weight=loss_batch_weight)

    def __call__(self, img: Masked, cond: Masked, key: jax.Array,
                 **kwargs) -> Array:
        kt, kn = jax.random.split(key)
        b = img.value.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.num_timesteps)
        return self.p_losses(img, t, cond, kn, **kwargs)

    # -- sampling ----------------------------------------------------------
    def _clamp(self, x: Array) -> Array:
        return jnp.clip(x, self.clamp_range[0], self.clamp_range[1])

    def ddim_sample(self, start: Masked, cond: Masked, key: jax.Array,
                    **kwargs) -> Masked:
        """DDIM sampler as one lax.scan (``ddpm.py:284-321``)."""
        total, steps = self.num_timesteps, self.sampling_timesteps
        eta = self.ddim_sampling_eta
        times = np.linspace(-1, total - 1, steps + 1).astype(np.int64)
        times = list(reversed(times.tolist()))
        pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int32)
        lengths = start.lengths
        ac = self._buf("alphas_cumprod")

        def body(carry, inp):
            img, k = carry
            pair, = inp
            time, time_next = pair[0], pair[1]
            k, k1 = jax.random.split(k)
            t_b = jnp.full((img.shape[0],), time, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                Masked(img, lengths, 1), t_b, cond, **kwargs)
            xs = Masked(self._clamp(x_start.value), lengths,
                        1).apply_mask().value
            alpha = ac[time]
            alpha_next = jnp.where(time_next >= 0, ac[time_next], 1.0)
            sigma = eta * jnp.sqrt(
                jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next)
                            / (1 - alpha), 0.0))
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma ** 2, 0.0))
            noise = jax.random.normal(k1, img.shape, jnp.float32)
            nxt = (xs * jnp.sqrt(alpha_next) + c * pred_noise.value
                   + sigma * noise * self.sigma)
            # Final step (time_next < 0): output x_start directly.
            img = jnp.where(time_next < 0, xs, nxt)
            img = jnp.where(Masked(img, lengths, 1).expanded_mask(), img,
                            0.0)
            return (img, k), None

        (img, _), _ = jax.lax.scan(
            body, (start.value.astype(jnp.float32), key), (pairs,))
        return Masked(img, lengths, 1)

    def p_sample_loop(self, start: Masked, cond: Masked, key: jax.Array,
                      **kwargs) -> Masked:
        """Strided ancestral sampler as lax.scan (``ddpm.py:266-282``)."""
        stride = self.num_timesteps // self.sampling_timesteps
        ts = np.asarray(
            list(reversed(range(0, self.num_timesteps, stride))), np.int32)
        lengths = start.lengths

        def body(carry, t):
            img, k = carry
            k, k1 = jax.random.split(k)
            t_b = jnp.full((img.shape[0],), t, jnp.int32)
            _, x_start = self.model_predictions(
                Masked(img, lengths, 1), t_b, cond, **kwargs)
            xs = self._clamp(x_start.value)
            mean, _, logvar = self.q_posterior(xs, img, t_b)
            noise = jax.random.normal(k1, img.shape, jnp.float32)
            noise = jnp.where(t > 0, noise * self.sigma, 0.0)
            img = mean + jnp.exp(0.5 * logvar) * noise
            img = jnp.where(Masked(img, lengths, 1).expanded_mask(), img,
                            0.0)
            return (img, k), None

        (img, _), _ = jax.lax.scan(
            body, (start.value.astype(jnp.float32), key), ts)
        return Masked(img, lengths, 1)

    def sample(self, start: Masked, cond: Masked, key: jax.Array,
               **kwargs) -> Masked:
        if self.is_ddim_sampling:
            return self.ddim_sample(start, cond, key, **kwargs)
        return self.p_sample_loop(start, cond, key, **kwargs)
