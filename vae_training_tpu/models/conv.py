"""Convolutional VAE for image datasets (BASELINE.json config 5).

Keeps the reference's VAE *semantics* — global learned posterior
log-variance ``epsilon_p`` (not amortized), optional tunable decoder
log-variance scalar, decoder output noise ``z2·e^{ε/2}`` added in both
training and sampling — but swaps the MLP encoder/decoder for conv stacks
sized for MNIST-scale images, with the ELBO computed over flattened pixels
(the reference flattens images before its FC VAE: /root/reference/vae.py:124).

The strided convs/transposed convs are MXU-friendly: XLA lowers them to
batched matmuls on the systolic array; channel counts are multiples of 8.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .networks import to_dot_precision


class ConvEncoder(nn.Module):
    """Strided conv stack → flatten → dense posterior mean."""

    latent_dim: int
    channels: Sequence[int] = (32, 64)
    matmul_precision: str = "bf16"  # --precision: "bf16" | "fp32"

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        prec = to_dot_precision(self.matmul_precision)
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"Conv{i}",
                        precision=prec)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.latent_dim, name="FCmu", precision=prec)(x)


class ConvDecoder(nn.Module):
    """Dense → reshape → transposed-conv stack → image."""

    out_hwc: Tuple[int, int, int]
    channels: Sequence[int] = (64, 32)
    sigmoid_head: bool = False
    matmul_precision: str = "bf16"  # --precision: "bf16" | "fp32"

    @nn.compact
    def __call__(self, z):  # z: (B, latent)
        h, w, c = self.out_hwc
        n_up = len(self.channels)
        prec = to_dot_precision(self.matmul_precision)
        h0, w0 = h // (2 ** n_up), w // (2 ** n_up)
        x = nn.Dense(h0 * w0 * self.channels[0], name="FCin",
                     precision=prec)(z)
        x = nn.relu(x)
        x = x.reshape(z.shape[0], h0, w0, self.channels[0])
        for i, ch in enumerate(self.channels[1:], start=1):
            x = nn.ConvTranspose(ch, (3, 3), strides=(2, 2), name=f"Up{i}",
                                 precision=prec)(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(c, (3, 3), strides=(2, 2), name="UpOut",
                             precision=prec)(x)
        if self.sigmoid_head:
            x = nn.sigmoid(x)
        return x


class ConvVAE(nn.Module):
    """Conv VAE with the reference's latent/noise semantics.

    ``__call__`` consumes flattened pixel batches (B, H·W·C) like the MLP
    VAE so the training engine, ELBO, and stats paths are shared verbatim —
    or NHWC batches (B, H, W, C) directly, which the epoch program prefers
    (conv-layout corpus gather, see docs/architecture.md conv accounting).
    """

    image_hwc: Tuple[int, int, int]
    latent_dim: int
    channels: Tuple[int, ...] = (32, 64)
    epsilon: float = 0.0
    tunable_decoder_var: bool = False
    dual_sigmoid_decoder: bool = False  # interface parity; unused for images
    matmul_precision: str = "bf16"  # --precision: "bf16" | "fp32"

    @property
    def data_dim(self) -> int:
        h, w, c = self.image_hwc
        return h * w * c

    def setup(self):
        h, w, c = self.image_hwc
        n_up = len(self.channels)
        if h % (2 ** n_up) or w % (2 ** n_up):
            raise ValueError(
                f"image size {h}x{w} must be divisible by 2^{n_up}"
            )
        self.encoder = ConvEncoder(
            self.latent_dim, channels=self.channels, name="Encoder",
            matmul_precision=self.matmul_precision)
        self.decoder = ConvDecoder(
            (h, w, c), channels=tuple(reversed(self.channels)), name="Decoder",
            matmul_precision=self.matmul_precision)
        self.epsilon_p = self.param(
            "epsilon_p", jax.nn.initializers.ones, (self.latent_dim,))
        if self.tunable_decoder_var:
            self.epsilon_scale = self.param(
                "epsilon", jax.nn.initializers.ones, (1,))

    def effective_epsilon(self):
        if self.tunable_decoder_var:
            return self.epsilon_scale * self.epsilon
        return jnp.asarray(self.epsilon)

    def decode(self, z):
        h, w, c = self.image_hwc
        return self.decoder(z).reshape(z.shape[0], h * w * c)

    def __call__(self, x, z1, z2):
        h, w, c = self.image_hwc
        # Accept NHWC batches directly (the epoch program stores its corpus
        # in conv layout — train/step.py make_epoch_chunk) as well as the
        # flat vectors every other caller passes.
        imgs = x if x.ndim == 4 else x.reshape(x.shape[0], h, w, c)
        mu = self.encoder(imgs)
        logvar_e = self.epsilon_p
        epsilon = self.effective_epsilon()
        samples = mu + jnp.exp(logvar_e / 2.0) * z1
        x_hat = self.decode(samples)
        x_hat = x_hat + z2 * jnp.exp(epsilon / 2.0)
        return x_hat, mu, logvar_e, epsilon

    def generate(self, z1, z2, epsilon):
        x_hat = self.decode(z1)
        return x_hat + z2 * jnp.exp(epsilon / 2.0)


def build_conv_vae(
    *,
    image_hwc: Tuple[int, int, int],
    latent_dim: int,
    channels_spec: str = "32|64",
    epsilon: float = 0.0,
    tunable_decoder_var: bool = False,
    precision: str = "bf16",
) -> ConvVAE:
    from .networks import parse_layer_sizes

    channels = parse_layer_sizes(channels_spec) or (32, 64)
    return ConvVAE(
        image_hwc=image_hwc,
        latent_dim=latent_dim,
        channels=tuple(channels),
        epsilon=epsilon,
        tunable_decoder_var=tunable_decoder_var,
        matmul_precision=precision,
    )
