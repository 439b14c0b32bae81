"""flax.linen VAE with the reference's (legacy-semantics) architecture.

Re-implements the behavior of /root/reference/networks.py:26-84 on modern
linen. The semantics being preserved (see SURVEY.md §7 "legacy-semantics
traps"):

  - the encoder outputs the posterior *mean* only; the posterior
    log-variance is a single learned global vector ``epsilon_p`` (ones
    init), NOT an amortized per-input head (networks.py:67-72);
  - with ``tunable_decoder_var`` the decoder log-variance is
    ``param('epsilon', (1,), ones) * epsilon_const`` — a learned scalar
    *multiplying* the CLI ε (networks.py:70-71);
  - for the sigmoid dataset the decoder is a sum of a sigmoid-headed MLP
    and a plain MLP (networks.py:75-78);
  - decoder output noise ``z2 * exp(ε/2)`` is added in BOTH training and
    ancestral-sampling mode (networks.py:81-83);
  - sampling mode sets mu = logvar_e = 0 so the latent is exactly z1
    (networks.py:62-65).

Parameter names mirror the reference's module tree (Encoder/Decoder/
SigDecoder with FC{i} layers, epsilon_p, epsilon) so exported state dicts
are structurally comparable to the reference's model.pkl.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def to_dot_precision(spec: str) -> Optional[jax.lax.Precision]:
    """--precision value → the per-dot precision for linen/kernel matmuls.

    ``bf16`` (default) → None: the TPU's native f32-dot mode (single-pass
    bfloat16 operands, f32 accumulation — XLA and Mosaic alike). ``fp32`` →
    ``Precision.HIGHEST``: true-fp32 matmuls. See docs/architecture.md
    "Matmul precision" and tools/check_precision.py.
    """
    return jax.lax.Precision.HIGHEST if spec == "fp32" else None


class FullyConnectedNetwork(nn.Module):
    """Dense stack: ReLU (or leaky) between layers, none after the last.

    Behavioral port of /root/reference/networks.py:26-47. ``features``
    includes the output dimension (the reference appends latent/data dim to
    the parsed pipe-string — /root/reference/vae.py:53-54). An empty
    hidden-layer string therefore yields a single Dense layer: a pure
    linear map, which the linear/sigmoid sweeps rely on.
    """

    features: Sequence[int]
    sigmoid_head: bool = False
    leaky: bool = False
    batch_norm: bool = False
    unit_normal_init: bool = False  # reference's `datasets=True` kernel init
    matmul_precision: str = "bf16"  # --precision: "bf16" | "fp32"

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        kernel_init = (
            jax.nn.initializers.normal(1.0)
            if self.unit_normal_init
            else nn.linear.default_kernel_init
        )
        prec = to_dot_precision(self.matmul_precision)
        n = len(self.features)
        for i, size in enumerate(self.features):
            x = nn.Dense(size, name=f"FC{i}", kernel_init=kernel_init,
                         precision=prec)(x)
            if i + 1 < n:
                x = nn.leaky_relu(x, 0.1) if self.leaky else nn.relu(x)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train)(x)
        if self.sigmoid_head:
            x = nn.sigmoid(x)
        return x


class VAE(nn.Module):
    """VAE with global posterior log-variance and optional dual decoder.

    ``encoder_features``/``decoder_features`` already include the final
    latent/data dimensions. ``epsilon`` is the CLI log-variance constant.
    ``dual_sigmoid_decoder`` enables the sigmoid-dataset decoder pair.
    """

    encoder_features: Tuple[int, ...]
    decoder_features: Tuple[int, ...]
    latent_dim: int
    epsilon: float = 0.0
    tunable_decoder_var: bool = False
    dual_sigmoid_decoder: bool = False
    matmul_precision: str = "bf16"  # --precision: "bf16" | "fp32"

    def setup(self):
        self.encoder = FullyConnectedNetwork(
            self.encoder_features, name="Encoder",
            matmul_precision=self.matmul_precision)
        self.decoder = FullyConnectedNetwork(
            self.decoder_features, name="Decoder",
            matmul_precision=self.matmul_precision)
        if self.dual_sigmoid_decoder:
            self.sig_decoder = FullyConnectedNetwork(
                self.decoder_features, sigmoid_head=True, name="SigDecoder",
                matmul_precision=self.matmul_precision
            )
        # Global posterior log-variance vector — ones init
        # (/root/reference/networks.py:69).
        self.epsilon_p = self.param(
            "epsilon_p", jax.nn.initializers.ones, (self.latent_dim,)
        )
        if self.tunable_decoder_var:
            # Learned scalar multiplying the ε constant
            # (/root/reference/networks.py:70-71).
            self.epsilon_scale = self.param(
                "epsilon", jax.nn.initializers.ones, (1,)
            )

    def decode(self, samples):
        x_hat = self.decoder(samples)
        if self.dual_sigmoid_decoder:
            x_hat = self.sig_decoder(samples) + x_hat
        return x_hat

    def effective_epsilon(self):
        """Decoder log-variance: learned-scalar × constant, or the constant."""
        if self.tunable_decoder_var:
            return self.epsilon_scale * self.epsilon
        return jnp.asarray(self.epsilon)

    def __call__(self, x, z1, z2):
        """Training-mode forward: returns (x_hat, mu, logvar_e, epsilon)."""
        mu = self.encoder(x)
        logvar_e = self.epsilon_p
        epsilon = self.effective_epsilon()
        samples = mu + jnp.exp(logvar_e / 2.0) * z1  # reparameterisation
        x_hat = self.decode(samples)
        x_hat = x_hat + z2 * jnp.exp(epsilon / 2.0)  # decoder output noise
        return x_hat, mu, logvar_e, epsilon

    def generate(self, z1, z2, epsilon):
        """Ancestral sampling: mu = logvar_e = 0 ⇒ latent is exactly z1.

        ``epsilon`` is supplied by the caller (the engine threads the
        current learned decoder log-variance — /root/reference/vae.py:199).
        Output noise IS added, matching /root/reference/networks.py:81-83.
        """
        x_hat = self.decode(z1)
        return x_hat + z2 * jnp.exp(epsilon / 2.0)


def parse_layer_sizes(spec: str) -> Tuple[int, ...]:
    """'512|512' → (512, 512); '' → () (pure linear model).

    Reference: /root/reference/vae.py:53-54, /root/reference/utils.py:313.
    """
    if spec == "":
        return ()
    return tuple(int(s) for s in spec.split("|"))


def build_vae(
    *,
    data_dim: int,
    latent_dim: int,
    encoder_layer_sizes: str = "",
    decoder_layer_sizes: str = "",
    epsilon: float = 0.0,
    tunable_decoder_var: bool = False,
    dataset_name: str | None = None,
    precision: str = "bf16",
) -> VAE:
    """Construct a VAE from the reference's CLI-level hyperparameters."""
    enc = parse_layer_sizes(encoder_layer_sizes) + (latent_dim,)
    dec = parse_layer_sizes(decoder_layer_sizes) + (data_dim,)
    return VAE(
        encoder_features=enc,
        decoder_features=dec,
        latent_dim=latent_dim,
        epsilon=epsilon,
        tunable_decoder_var=tunable_decoder_var,
        dual_sigmoid_decoder=(dataset_name == "sigmoid"),
        matmul_precision=precision,
    )
