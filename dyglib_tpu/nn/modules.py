"""Shared neural modules (flax.linen).

Behavioral parity targets in the reference's models/modules.py:
  * TimeEncoder (modules.py:7-39) — cos(W t + b), W initialized to the fixed
    spectrum 1/10^linspace(0,9,d), b = 0; optionally frozen (GraphMixer).
  * MergeLayer (modules.py:42-68) — concat -> Linear -> ReLU -> Linear.
  * MLPClassifier (modules.py:71-96) — input -> 80 -> 10 -> 1 with
    ReLU + dropout.
  * MultiHeadAttention (modules.py:99-206) — single-query temporal
    attention: q = [node_feat || Phi(0)], k = v =
    [nbr_feat || edge_feat || Phi(dt)], pad logits filled with -1e10 (NOT
    -inf, so all-padded rows survive softmax), residual_fc + dropout +
    LayerNorm(out + residual).
  * TransformerEncoder (modules.py:209-266) — POST-LN residual blocks with a
    4x ReLU FFN and key-padding masking; supports cross-attention (used by
    TCL and CAWN). DyGFormer's local pre-LN encoder is a separate module in
    models/dygformer.py, mirroring the reference's two distinct variants.

All LayerNorms use eps=1e-5 (torch default) for oracle parity.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5  # torch nn.LayerNorm default


def uniform_init(bound: float):
    """U(-bound, +bound) initializer (torch's nn.Linear / RNN-cell family)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch.nn.Linear's DEFAULT init: kaiming-uniform
    weight (= U(+-1/sqrt(fan_in)) at torch's a=sqrt(5)) and
    U(+-1/sqrt(fan_in)) bias.

    The parameter tree is identical to nn.Dense ({name}/kernel, bias), so
    checkpoints and the weight-transplant parity tests are unaffected —
    only the INIT DISTRIBUTION changes. That distribution is
    metrics-visible: the post-LN transformer stacks train measurably
    slower from flax's lecun-normal/zero-bias defaults (TCL calibration:
    train loss stuck at ~ln 2 for 10 epochs; with torch init it matches
    the reference's trajectory — scripts/reference_calibration.py).

    ``kernel_init_override`` serves torch layers whose weights are
    re-initialized after construction (nn.MultiheadAttention's
    xavier-uniform in_proj); ``zero_bias`` its zeroed biases.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init_override: object = None
    zero_bias: bool = False
    # Lane-alignment padding (math-exact, param tree UNCHANGED): TPU lanes
    # are 128-wide, so reshaping a (.., H*hd) projection into (.., H, hd)
    # with hd % 128 != 0 is a lane repack XLA materializes as a copy.
    # ``out_group_pad=(g, gw, pw)`` treats the declared ``features = g*gw``
    # output as g groups of gw and zero-pads each to pw columns AT APPLY
    # TIME (the padded kernel is built from the unpadded param by a tiny
    # pad op), so output is (.., g*pw) and the (.., g, pw) reshape is
    # tile-aligned. ``in_group_pad=(g, gw, pw)`` accepts a group-padded
    # (.., g*pw) input by inserting matching zero ROWS into the declared
    # (g*gw, features) kernel. Padded entries are exactly zero in forward
    # and receive no gradient (they're built by pad, not parameters).
    out_group_pad: tuple[int, int, int] | None = None
    in_group_pad: tuple[int, int, int] | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.in_group_pad is not None:
            g, gw, pw = self.in_group_pad
            assert x.shape[-1] == g * pw, (x.shape, self.in_group_pad)
            fan_in = g * gw
        else:
            fan_in = x.shape[-1]
        bound = float(fan_in) ** -0.5
        kinit = self.kernel_init_override or uniform_init(bound)
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        if self.in_group_pad is not None:
            g, gw, pw = self.in_group_pad
            kernel = jnp.pad(
                kernel.reshape(g, gw, self.features),
                ((0, 0), (0, pw - gw), (0, 0)),
            ).reshape(g * pw, self.features)
        if self.out_group_pad is not None:
            g, gw, pw = self.out_group_pad
            assert self.features == g * gw, (self.features, self.out_group_pad)
            kernel = jnp.pad(
                kernel.reshape(kernel.shape[0], g, gw),
                ((0, 0), (0, 0), (0, pw - gw)),
            ).reshape(kernel.shape[0], g * pw)
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            binit = (
                nn.initializers.zeros if self.zero_bias else uniform_init(bound)
            )
            bias = self.param("bias", binit, (self.features,))
            if self.out_group_pad is not None:
                g, gw, pw = self.out_group_pad
                bias = jnp.pad(
                    bias.reshape(g, gw), ((0, 0), (0, pw - gw))
                ).reshape(g * pw)
            y = y + bias.astype(dtype)
        return y


def double_uniform_init(bound: float):
    """Sum of two independent U(-bound, +bound) draws (triangular
    distribution, std bound*sqrt(2/3)).

    torch's RNN/LSTM/GRU cells carry TWO bias vectors (b_ih, b_hh), each
    U(+-1/sqrt(hidden)); our fused cells merge them into one parameter
    (transplant maps b_ih + b_hh onto it), so init parity requires the
    SUM's distribution, not a single uniform — the same
    init-distribution-is-metrics-visible lesson as TorchLinear."""

    def init(key, shape, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return jax.random.uniform(
            k1, shape, dtype, -bound, bound
        ) + jax.random.uniform(k2, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ for a (fan_in, fan_out) kernel."""
    bound = (6.0 / (shape[0] + shape[1])) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def time_encoder_spectrum(time_dim: int) -> np.ndarray:
    """The fixed 1/10^linspace(0,9,d) frequency init (modules.py:20)."""
    return (1.0 / 10 ** np.linspace(0, 9, time_dim, dtype=np.float32)).reshape(
        1, time_dim
    )


class TimeEncoder(nn.Module):
    """Cosine time features phi(t) = cos(w*t + b) (modules.py:7-39).

    setup-style (not nn.compact) so fused kernels can read the raw
    parameters via ``weights()`` — e.g. the window-gather attention kernel
    computes Phi(dt) on-chip instead of materializing the (M, K, Dt)
    tensor in HBM (ops/pallas/window_attention.py). Parameter tree is
    unchanged ({name}/w, {name}/b).
    """

    time_dim: int
    trainable: bool = True

    def setup(self):
        self._w = self.param(
            "w", lambda key: jnp.asarray(time_encoder_spectrum(self.time_dim))
        )
        self._b = self.param("b", nn.initializers.zeros, (self.time_dim,))

    def weights(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """((1, time_dim) w, (time_dim,) b), gradient-stopped if frozen."""
        w, b = self._w, self._b
        if not self.trainable:
            # frozen spectrum (GraphMixer passes parameter_requires_grad=False,
            # reference GraphMixer.py:45): zero the gradient, keep the param
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b)
        return w, b

    def __call__(self, timestamps: jnp.ndarray) -> jnp.ndarray:
        """(...,) times -> (..., time_dim) features.

        Uses the fast-math cosine on TPU (ops/fast_trig.py gate; exact
        jnp.cos elsewhere — parity tests run on CPU and stay bitwise
        torch-matching). Measured: XLA's cos is ~36 cycles/element of
        range reduction; the fast path is ~15 VPU ops at <=1e-4 abs error
        wherever f32's own theta quantization doesn't already dominate."""
        from ..ops import fast_trig

        w, b = self.weights()
        return fast_trig.cos(timestamps[..., None] * w[0] + b)


class FusedGRUCell(nn.Module):
    """GRU cell in torch's exact parameterization (nn.GRUCell):

        r = sigmoid(x Wi_r + bi_r + h Wh_r + bh_r)
        z = sigmoid(x Wi_z + bi_z + h Wh_z + bh_z)
        n = tanh  (x Wi_n + bi_n + r * (h Wh_n + bh_n))
        h' = (1 - z) n + z h

    Params: wi (D, 3H), wh (H, 3H), bi (3H,), bh (3H,) — gate order
    [r | z | n], all U(+-1/sqrt(H)) like torch. Two fused matmuls replace
    flax GRUCell's six narrow Denses (the memory-model step is
    memory-ops-bound), torch's b_hn-inside-the-reset-gate semantics are
    exact, and transplant mapping is a direct transpose."""

    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hd = self.features
        init = uniform_init(hd ** -0.5)
        wi = self.param("wi", init, (x.shape[-1], 3 * hd))
        wh = self.param("wh", init, (hd, 3 * hd))
        bi = self.param("bi", init, (3 * hd,))
        bh = self.param("bh", init, (3 * hd,))
        gi = x @ wi + bi
        gh = h @ wh + bh
        r = nn.sigmoid(gi[..., :hd] + gh[..., :hd])
        z = nn.sigmoid(gi[..., hd : 2 * hd] + gh[..., hd : 2 * hd])
        n = jnp.tanh(gi[..., 2 * hd :] + r * gh[..., 2 * hd :])
        return (1.0 - z) * n + z * h


class FusedRNNCell(nn.Module):
    """torch nn.RNNCell (tanh): h' = tanh(x Wi + bi + h Wh + bh);
    params U(+-1/sqrt(H))."""

    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hd = self.features
        init = uniform_init(hd ** -0.5)
        wi = self.param("wi", init, (x.shape[-1], hd))
        wh = self.param("wh", init, (hd, hd))
        bi = self.param("bi", init, (hd,))
        bh = self.param("bh", init, (hd,))
        return jnp.tanh(x @ wi + bi + h @ wh + bh)


class MergeLayer(nn.Module):
    """concat(x1, x2) -> hidden -> output with ReLU (modules.py:42-68)."""

    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, input_1: jnp.ndarray, input_2: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([input_1, input_2], axis=-1)
        h = TorchLinear(self.hidden_dim, name="fc1")(x)
        return TorchLinear(self.output_dim, name="fc2")(nn.relu(h))


class MLPClassifier(nn.Module):
    """input -> 80 -> 10 -> 1 head for node classification (modules.py:71-96)."""

    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.dropout, deterministic=not train)(
            nn.relu(TorchLinear(80, name="fc1")(x))
        )
        x = nn.Dropout(self.dropout, deterministic=not train)(
            nn.relu(TorchLinear(10, name="fc2")(x))
        )
        return TorchLinear(1, name="fc3")(x)


class RawLinearParams(nn.Module):
    """TorchLinear's (kernel, bias) parameters WITHOUT applying them —
    for fused kernels that consume raw weights. Same param tree and init
    as TorchLinear({name}) so the two paths share checkpoints."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        bound = float(self.in_dim) ** -0.5
        kernel = self.param(
            "kernel", uniform_init(bound), (self.in_dim, self.out_dim)
        )
        bias = self.param("bias", uniform_init(bound), (self.out_dim,))
        return kernel, bias


class _RawKernel(nn.Module):
    """A bare (in_dim, out_dim) kernel parameter with nn.Dense's param path
    ({name}/kernel) and init — lets the fused-attention path consume raw
    weights while staying checkpoint-compatible with the Dense path."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", uniform_init(self.in_dim ** -0.5),
            (self.in_dim, self.out_dim),
        )


class TemporalMultiHeadAttention(nn.Module):
    """Single-query temporal attention over K sampled neighbors
    (modules.py:99-206).

    query  = [node_feat || node_time_feat]            (1 token)
    key=val= [nbr_feat || edge_feat || nbr_time_feat] (K tokens)
    Padded neighbors get logit -1e10 so fully-padded rows still produce a
    finite (uniform-attention) output instead of NaN (modules.py:182-184).

    ``dtype`` selects the computation dtype (bfloat16 for MXU single-pass);
    parameters stay float32 and the output is cast back to float32.

    ``use_pallas`` routes the concat -> K/V projection -> masked softmax ->
    weighted sum through the fused Pallas kernel
    (ops/pallas/temporal_attention.py) — same math, same parameter tree,
    intermediates kept in VMEM instead of HBM.
    """

    num_heads: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # split-input K/V projections: key = nbr @ Wk[:Dn] + edge @ Wk[Dn:Dn+De]
    # + Phi @ Wk[Dn+De:] instead of concat([nbr,edge,Phi]) @ Wk. Same math,
    # same param tree (row slices of the declared kernel are sublane
    # slices). Avoids materializing the (B*K, 444) concat, and any segment
    # whose source carries no gradient (edge features always; node
    # features at hop level 0, where they are frozen table rows) becomes a
    # separate dead cotangent dot XLA can DCE — impossible in the fused
    # d_kv dot of the concat formulation (2x 1.4 ms/step in the TGAT
    # trace).
    split_kv: bool = False

    @nn.compact
    def __call__(
        self,
        node_features: jnp.ndarray,  # (B, Dn)
        node_time_features: jnp.ndarray,  # (B, Dt)
        neighbor_node_features: jnp.ndarray,  # (B, K, Dn)
        neighbor_time_features: jnp.ndarray,  # (B, K, Dt)
        neighbor_edge_features: jnp.ndarray,  # (B, K, De)
        neighbor_mask: jnp.ndarray,  # (B, K) bool, True = real neighbor
        *,
        train: bool = False,
        window: tuple | None = None,
        gathered: tuple | None = None,
        time_fused: tuple | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        query_dim = node_features.shape[-1] + node_time_features.shape[-1]
        assert query_dim % self.num_heads == 0
        head_dim = query_dim // self.num_heads

        query = residual = jnp.concatenate(
            [node_features, node_time_features], axis=-1
        ).astype(self.dtype)  # (B, Dq)

        dense = lambda d, name, bias=True: TorchLinear(
            d, use_bias=bias, dtype=self.dtype, name=name
        )
        q = dense(query_dim, "query_projection", False)(query)

        if gathered is not None:
            # post-gather fused kernel: kv rows arrive pre-gathered
            # (M*K, Dn+De); Phi(dt), K/V projection, masked softmax and
            # the weighted sum run in VMEM; kv rows are RAW features so
            # the custom VJP emits no feature gradient
            # (ops/pallas/gathered_attention.py)
            from ..ops.pallas.gathered_attention import gathered_attention

            feat_n, feat_e, dt, (tw, tb) = gathered
            b, k = neighbor_mask.shape
            kv_dim = feat_n.shape[-1] + feat_e.shape[-1] + tw.shape[-1]
            wk = _RawKernel(kv_dim, query_dim, name="key_projection")()
            wv = _RawKernel(kv_dim, query_dim, name="value_projection")()
            if train and self.dropout > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout,
                    (b, self.num_heads, k),
                ).astype(jnp.float32) / (1.0 - self.dropout)
            else:
                keep = jnp.ones((b, self.num_heads, k), jnp.float32)
            # the kernel's VJP emits no feature cotangent (kv rows are raw
            # frozen tables); stop_gradient makes that contract explicit so
            # a gradient-carrying caller fails loudly in review, not
            # silently at train time
            out = gathered_attention(
                q.astype(jnp.float32), jax.lax.stop_gradient(feat_n),
                jax.lax.stop_gradient(feat_e), dt,
                neighbor_mask.astype(jnp.float32), keep,
                (tw.reshape(-1), tb), (wk, wv), self.num_heads,
            )
            out = nn.Dropout(self.dropout, deterministic=not train)(
                TorchLinear(query_dim, dtype=self.dtype, name="residual_fc")(
                    out.astype(self.dtype)
                )
            )
            out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(
                (out + residual).astype(jnp.float32)
            )
            return out, None

        if window is not None:
            # fused window-gather path: kv rows are fetched in-kernel from
            # the contiguous entry-table windows of the 'recent' strategy
            # and Phi(dt) is computed on-chip — the neighbor feature
            # tensors never exist in HBM (ops/pallas/window_attention.py)
            from ..ops.pallas.window_attention import window_attention

            starts, dt, table, feat_dim, (tw, tb) = window
            b, k = neighbor_mask.shape
            # feat_dim = LOGICAL Dn+De (the table's lane dim is zero-padded
            # to the 128 tiling; the kernel pads the weights to match)
            kv_dim = feat_dim + tw.shape[-1]
            wk = _RawKernel(kv_dim, query_dim, name="key_projection")()
            wv = _RawKernel(kv_dim, query_dim, name="value_projection")()
            if train and self.dropout > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout,
                    (b, self.num_heads, k),
                ).astype(jnp.float32) / (1.0 - self.dropout)
            else:
                keep = jnp.ones((b, self.num_heads, k), jnp.float32)
            # same no-feature-gradient contract as the gathered kernel
            out = window_attention(
                q.astype(jnp.float32), starts, dt,
                neighbor_mask.astype(jnp.float32), keep,
                jax.lax.stop_gradient(table),
                tw.reshape(-1), tb, (wk, wv), self.num_heads,
            )
            out = nn.Dropout(self.dropout, deterministic=not train)(
                TorchLinear(query_dim, dtype=self.dtype, name="residual_fc")(
                    out.astype(self.dtype)
                )
            )
            out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(
                (out + residual).astype(jnp.float32)
            )
            return out, None

        b, k = neighbor_node_features.shape[:2]
        if time_fused is not None:
            # fused Phi path (ops/pallas/phi_projection.py): a kv row is
            # [feat || Phi(dt)], so key = feat @ Wk[:Df] + Phi(dt) @ Wk[Df:]
            # — the (B*K, Dt) time-feature tensor and the concatenate
            # never exist in HBM. Same param tree (the RAW (Dkv, Dq)
            # kernels are sliced, not split).
            from ..ops.pallas.phi_projection import phi_projection

            dt, (tw, tb) = time_fused
            kv_feat = jnp.concatenate(
                [neighbor_node_features, neighbor_edge_features], axis=-1
            )  # (B, K, Df)
            d_feat = kv_feat.shape[-1]
            dt_dim = tw.shape[-1]
            kv_dim = d_feat + dt_dim
            wk = _RawKernel(kv_dim, query_dim, name="key_projection")()
            wv = _RawKernel(kv_dim, query_dim, name="value_projection")()
            feat_flat = kv_feat.reshape(b * k, d_feat).astype(self.dtype)
            dt_flat = dt.reshape(-1)
            twf, tbf = tw.reshape(-1), tb.reshape(-1)
            key = (
                (feat_flat @ wk[:d_feat].astype(self.dtype)).astype(jnp.float32)
                + phi_projection(dt_flat, twf, tbf, wk[d_feat:])
            ).reshape(b, k, query_dim).astype(self.dtype)
            val = (
                (feat_flat @ wv[:d_feat].astype(self.dtype)).astype(jnp.float32)
                + phi_projection(dt_flat, twf, tbf, wv[d_feat:])
            ).reshape(b, k, query_dim).astype(self.dtype)

            q = q.reshape(b, self.num_heads, 1, head_dim)
            key = key.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            val = val.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            attn = jnp.einsum("bhld,bhnd->bhln", q, key).astype(jnp.float32) * (
                head_dim**-0.5
            )
            attn = jnp.where(neighbor_mask[:, None, None, :], attn, -1e10)
            scores = nn.softmax(attn, axis=-1)
            scores = nn.Dropout(self.dropout, deterministic=not train)(scores)
            out = jnp.einsum("bhln,bhnd->bhld", scores.astype(self.dtype), val)
            out = out.transpose(0, 2, 1, 3).reshape(b, query_dim)
            out = nn.Dropout(self.dropout, deterministic=not train)(
                TorchLinear(query_dim, dtype=self.dtype, name="residual_fc")(out)
            )
            out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(
                (out + residual).astype(jnp.float32)
            )
            return out, scores[:, :, 0, :].astype(jnp.float32)

        if self.split_kv and not self.use_pallas:
            dn = neighbor_node_features.shape[-1]
            de_ = neighbor_edge_features.shape[-1]
            dt_ = neighbor_time_features.shape[-1]
            kv_dim = dn + de_ + dt_
            wk = _RawKernel(kv_dim, query_dim, name="key_projection")()
            wv = _RawKernel(kv_dim, query_dim, name="value_projection")()
            # no stop_gradient: at hop levels > 0 the neighbor features are
            # recursive embeddings that carry gradients; where they are raw
            # frozen table rows the per-segment cotangent dot is dead code
            # XLA can now DCE (impossible in the fused-concat formulation)
            fn = neighbor_node_features.astype(self.dtype)
            fe = neighbor_edge_features.astype(self.dtype)
            ft = neighbor_time_features.astype(self.dtype)

            def proj(w):
                w = w.astype(self.dtype)
                return (
                    fn @ w[:dn] + fe @ w[dn : dn + de_] + ft @ w[dn + de_ :]
                )

            key, val = proj(wk), proj(wv)
            q = q.reshape(b, self.num_heads, 1, head_dim)
            key = key.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            val = val.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            attn = jnp.einsum("bhld,bhnd->bhln", q, key).astype(jnp.float32) * (
                head_dim**-0.5
            )
            attn = jnp.where(neighbor_mask[:, None, None, :], attn, -1e10)
            scores = nn.softmax(attn, axis=-1)
            scores = nn.Dropout(self.dropout, deterministic=not train)(scores)
            out = jnp.einsum("bhln,bhnd->bhld", scores.astype(self.dtype), val)
            out = out.transpose(0, 2, 1, 3).reshape(b, query_dim)
            out = nn.Dropout(self.dropout, deterministic=not train)(
                TorchLinear(query_dim, dtype=self.dtype, name="residual_fc")(out)
            )
            out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(
                (out + residual).astype(jnp.float32)
            )
            return out, scores[:, :, 0, :].astype(jnp.float32)

        kv = jnp.concatenate(
            [neighbor_node_features, neighbor_edge_features, neighbor_time_features],
            axis=-1,
        ).astype(self.dtype)  # (B, K, Dk)

        if self.use_pallas:
            from ..ops.pallas.temporal_attention import temporal_attention

            kv_dim = kv.shape[-1]
            wk = _RawKernel(kv_dim, query_dim, name="key_projection")()
            wv = _RawKernel(kv_dim, query_dim, name="value_projection")()
            if train and self.dropout > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout,
                    (b, self.num_heads, k),
                ).astype(jnp.float32) / (1.0 - self.dropout)
            else:
                keep = jnp.ones((b, self.num_heads, k), jnp.float32)
            out, scores = temporal_attention(
                q.astype(jnp.float32),
                neighbor_node_features.astype(jnp.float32),
                neighbor_edge_features.astype(jnp.float32),
                neighbor_time_features.astype(jnp.float32),
                neighbor_mask.astype(jnp.float32), keep, wk, wv,
                self.num_heads,
            )
            out = nn.Dropout(self.dropout, deterministic=not train)(
                TorchLinear(query_dim, dtype=self.dtype, name="residual_fc")(
                    out.astype(self.dtype)
                )
            )
            out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(
                (out + residual).astype(jnp.float32)
            )
            return out, scores

        # NOTE: fusing key+value into one 2*query_dim Dense measured SLOWER
        # (the split of the 544-wide output into two 272-wide halves is a
        # lane-unaligned repack, 2.1 ms/step at the TGAT operating point —
        # scripts/trace_ops.py); separate projections let each output keep
        # its own tile layout.
        key = dense(query_dim, "key_projection", False)(kv)
        val = dense(query_dim, "value_projection", False)(kv)

        # NOTE: reformulating these single-query einsums as VPU
        # multiply+reduce measured SLOWER (19.9 vs 16.8 ms/step at the TGAT
        # operating point — the reduction crosses the lane axis and the
        # (B,K,H,hd) product materializes); the batched-matvec einsums stand.
        q = q.reshape(b, self.num_heads, 1, head_dim)
        key = key.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        val = val.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhld,bhnd->bhln", q, key).astype(jnp.float32) * (
            head_dim**-0.5
        )
        attn = jnp.where(neighbor_mask[:, None, None, :], attn, -1e10)
        scores = nn.softmax(attn, axis=-1)
        scores = nn.Dropout(self.dropout, deterministic=not train)(scores)

        out = jnp.einsum("bhln,bhnd->bhld", scores.astype(self.dtype), val)
        out = out.transpose(0, 2, 1, 3).reshape(b, query_dim)
        out = nn.Dropout(self.dropout, deterministic=not train)(
            TorchLinear(query_dim, dtype=self.dtype, name="residual_fc")(out)
        )
        out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(
            (out + residual).astype(jnp.float32)
        )
        return out, scores[:, :, 0, :].astype(jnp.float32)


class TransformerEncoder(nn.Module):
    """Post-LN transformer block with optional cross-attention
    (modules.py:209-266; torch nn.MultiheadAttention semantics).

    Padded key positions are masked with a large negative logit rather than
    -inf so that an all-padded key row yields finite (uniform) attention —
    callers in the reference always include the non-padded target token, so
    the two conventions never diverge on real inputs.
    """

    attention_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32  # computation dtype; params stay float32

    @nn.compact
    def __call__(
        self,
        inputs_query: jnp.ndarray,  # (B, Tq, D)
        inputs_key: jnp.ndarray | None = None,  # (B, Tk, D)
        inputs_value: jnp.ndarray | None = None,
        neighbor_mask: jnp.ndarray | None = None,  # (B, Tk) bool, True = keep
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        if inputs_key is None or inputs_value is None:
            assert inputs_key is None and inputs_value is None
            inputs_key = inputs_value = inputs_query
        d = self.attention_dim
        assert d % self.num_heads == 0
        hd = d // self.num_heads
        b, tq, _ = inputs_query.shape
        tk = inputs_key.shape[1]
        # torch nn.MultiheadAttention init: xavier-uniform in_proj with
        # ZERO bias, default-Linear out_proj kernel with ZERO bias
        attn_proj = lambda name: TorchLinear(
            d, dtype=self.dtype, name=name,
            kernel_init_override=xavier_uniform_init, zero_bias=True,
        )
        dense = lambda dd, name: TorchLinear(dd, dtype=self.dtype, name=name)

        q = attn_proj("q_proj")(inputs_query.astype(self.dtype))
        key = attn_proj("k_proj")(inputs_key.astype(self.dtype))
        val = attn_proj("v_proj")(inputs_value.astype(self.dtype))
        q = q.reshape(b, tq, self.num_heads, hd).transpose(0, 2, 1, 3)
        key = key.reshape(b, tk, self.num_heads, hd).transpose(0, 2, 1, 3)
        val = val.reshape(b, tk, self.num_heads, hd).transpose(0, 2, 1, 3)

        # logits + softmax in float32 regardless of computation dtype
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, key).astype(
            jnp.float32
        ) / jnp.sqrt(hd).astype(jnp.float32)
        if neighbor_mask is not None:
            attn = jnp.where(neighbor_mask[:, None, None, :], attn, -1e10)
        scores = nn.softmax(attn, axis=-1)
        scores = nn.Dropout(self.dropout, deterministic=not train)(scores)
        hidden = jnp.einsum("bhqk,bhkd->bhqd", scores.astype(self.dtype), val)
        hidden = hidden.transpose(0, 2, 1, 3).reshape(b, tq, d)
        hidden = TorchLinear(
            d, dtype=self.dtype, name="out_proj", zero_bias=True
        )(hidden).astype(jnp.float32)

        # post-LN residual blocks (modules.py:260-264)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(
            inputs_query + nn.Dropout(self.dropout, deterministic=not train)(hidden)
        )
        ffn = dense(4 * d, "ffn1")(x.astype(self.dtype))
        ffn = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(ffn))
        ffn = dense(d, "ffn2")(ffn).astype(jnp.float32)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm2")(
            x + nn.Dropout(self.dropout, deterministic=not train)(ffn)
        )
