"""N-step training-trajectory parity vs the torch golden model
(VERDICT r4 item 2).

The single-forward/backward golden tests (``test_torch_golden_graph``)
pin one step; this pins the *composition over steps* the reference's
training runs rely on — Adam + the warmup/ExponentialLR schedule
(``/root/reference/main.py:106-122``), gradient clipping
(``train_epoch.py:109-126``), BatchNorm running-stat evolution, the
straight-through sampler gradients, and AIMLE's cross-step adaptive
state (``target_aimle.py:130-161``) — by running the SAME 8 Adam steps
on both sides from identical (converter-shared) init with identical
per-step noise draws, then asserting per-step losses and final
parameter drift agree to fp32 tolerance.

Determinism levers:

* every dropout is zeroed on both sides (cfg.dropout/head_dropout/
  mask_dropout = 0; torch ``nn.Dropout.p = 0``) — noise-free by
  construction rather than by synchronized draws;
* sampler noise is shared: standard-Gumbel arrays drawn once in numpy,
  consumed by the torch transcription directly and by the JAX side via
  a patched ``jax.random.gumbel`` (the steps run eagerly, so the patch
  is honored per call);
* batch size 1 with graphs holding EXACTLY the node cap — at B=1 the
  reference's two cross-sample scrambles (the ``.view`` scramble,
  isubgvqa.py:244-246, and the ``ques_nn(u)[batch]`` double index,
  masking.py:153) are no-ops, and exact-cap graphs give the dense
  layout zero padding slots so the zero-filled-padding-competes-in-
  top-k quirk cannot separate layouts.

The torch sampler transcriptions follow the reference formulas
(``wrapper.py:123-172``, ``aimle.py:174-243``, ``gumbel_scheme.py:
26-107``), whose per-call exactness is already pinned by
``test_sampler_backward_exact``; here they compose over steps.
"""

import dataclasses
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.flatten_util
import jax.numpy as jnp

from isubgvqa_tpu.convert import convert_state_dict
from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab)
from isubgvqa_tpu.data.gqa import Sample
from isubgvqa_tpu.data.scene_graph import SceneGraphStore
from isubgvqa_tpu.data.synthetic import _random_scene_graph
from isubgvqa_tpu.models.build import build_model
from isubgvqa_tpu.train.schedule import make_optimizer
from isubgvqa_tpu.train.state import create_train_state
from isubgvqa_tpu.train.steps import make_train_step

from test_model import small_cfg
from test_torch_golden_graph import (NodeMaskToEdgeMaskFn,
                                     TorchRefISubGVQA, _ragged_from_batch,
                                     scatter_add, sdp_ref, segment_softmax)

C = 300
HEADS = 4
NINS = 4
CAP = 24                 # graphs are built with exactly CAP nodes
K = 3
N_STEPS = 8
STEPS_PER_EPOCH = 4      # the lr schedule crosses an epoch boundary
BASE_LR = 5e-5
EPS_TINY = float(np.finfo(np.float32).tiny)


# ------------------------------------------------------------- lr schedule

def lr_at(step: int) -> float:
    """warmup_exponential_schedule transcribed (train/schedule.py)."""
    epoch = step // STEPS_PER_EPOCH
    if epoch < 10:
        return 1e-6 + (BASE_LR - 1e-6) * min(epoch / 10, 1.0)
    return BASE_LR * 0.98 ** (epoch - 10)


# --------------------------------------------------------- torch samplers

def _topk_hard(x: torch.Tensor, k: int) -> torch.Tensor:
    _, ind = torch.topk(x, k, dim=-1)
    return torch.zeros_like(x).scatter_(-1, ind, 1.0)


def gumbel_sample_torch(dense: torch.Tensor, g: torch.Tensor,
                        k: int, tau: float = 0.1) -> torch.Tensor:
    """gumbel_scheme.py:63-90 (edge_candid, ensemble 1, hard STE)."""
    local_k = min(k, dense.shape[1])
    flat = dense + g
    khot = torch.zeros_like(flat)
    onehot = torch.zeros_like(flat)
    for _ in range(local_k):
        khot_mask = torch.clamp(1.0 - onehot, min=EPS_TINY)
        flat = flat + torch.log(khot_mask)
        onehot = torch.softmax(flat / tau, dim=1)
        khot = khot + onehot
    hard = _topk_hard(khot.detach(), local_k)
    return hard - khot.detach() + khot


class IMLETorch(torch.autograd.Function):
    """wrapper.py:75-172 + target.py:44-48 at nb_samples=1."""

    @staticmethod
    def forward(ctx, theta, noise, k, alpha, beta, in_temp, tgt_temp):
        pert = theta[:, None, :] + noise * in_temp
        z = _topk_hard(pert, k)
        ctx.save_for_backward(theta, noise, z)
        ctx.cfg = (k, alpha, beta, tgt_temp)
        return z[:, 0, :]

    @staticmethod
    def backward(ctx, dy):
        theta, noise, z = ctx.saved_tensors
        k, alpha, beta, tgt_temp = ctx.cfg
        dy3 = dy[:, None, :]
        target = alpha * theta[:, None, :] - beta * dy3
        zt = _topk_hard(target + noise * tgt_temp, k)
        return (z - zt).mean(1), None, None, None, None, None, None


class AIMLETorch(torch.autograd.Function):
    """aimle.py:82-243 + target_aimle.py:87-161 at nb_samples=1; the
    adaptive state is a mutable dict (reference: Python object state),
    updated in backward exactly like AdaptiveTargetDistribution."""

    @staticmethod
    def forward(ctx, theta, noise, k, alpha, theta_temp, tgt_temp, state):
        pert = theta[:, None, :] + noise * theta_temp
        z = _topk_hard(pert, k)
        ctx.save_for_backward(theta, noise)
        ctx.cfg = (k, alpha, tgt_temp)
        ctx.state = state
        return z[:, 0, :]

    @staticmethod
    def backward(ctx, dy):
        theta, noise = ctx.saved_tensors
        k, alpha, tgt_temp = ctx.cfg
        st = ctx.state
        dy3 = dy[:, None, :]
        tt = theta[:, None, :].expand_as(dy3)

        def pm(beta, th, d):
            nd = d.reshape(-1).norm()
            if float(nd) == 0.0:
                return torch.tensor(0.0)
            return beta * th.reshape(-1).norm() / torch.clamp(nd, min=1e-30)

        pm_params = pm(st["beta"], tt, dy3)
        target_r = alpha * tt - pm_params * dy3
        target_l = alpha * tt + pm_params * dy3
        eps = noise * tgt_temp
        z_r = _topk_hard(target_r + eps, k)
        z_l = _topk_hard(target_l + eps, k)
        grad3 = (z_l - z_r) / 2.0

        pm_process = pm(st["beta"], theta, dy3)
        b, s = grad3.shape[0], grad3.shape[1]
        nnz = float((grad3 != 0.0).sum())
        new_gn = 0.9 * st["grad_norm"] + 0.1 * nnz / (b * s)
        direction = 1.0 if new_gn < 1.0 else -1.0
        beta_update = 0.0 * st["prev_update"] + direction * 1e-4
        st["beta"] = max(st["beta"] + beta_update, 0.0)
        st["grad_norm"] = new_gn
        st["prev_update"] = beta_update

        scale = pm_process if float(pm_process) > 0.0 else torch.tensor(1.0)
        grad = (grad3 / scale).mean(1)
        return grad, None, None, None, None, None, None


# ------------------------------------------------------ torch train forward

def torch_forward_train(m, batch, lang_cache, sampler_type, noise_np,
                        aimle_state):
    """One full train-mode forward at B=1, masked conv3, returning the
    CE loss (isubgvqa.py:213-297 composition; train_epoch.py:109)."""
    ids = torch.tensor(np.asarray(batch.qst_tokens[0:1]), dtype=torch.long)
    qmask = torch.tensor(np.asarray(batch.qst_mask[0:1]), dtype=torch.long)
    nt, bb, ei, et, sym, bvec = _ragged_from_batch(batch, 0)
    label = torch.tensor(np.asarray(batch.labels[0:1]), dtype=torch.long)
    n = nt.shape[0]
    assert n == CAP, "fixture must fill the node cap exactly"

    b = 1
    pos = torch.arange(ids.size(1))
    src_emb = (m.text_vocab_embedding.token_embedding(ids)
               + m.text_vocab_embedding.position_embedding(pos)[None])
    enc = m.question_encoder.transformer_encoder(
        src_emb.permute(1, 0, 2), src_key_padding_mask=qmask.float())
    queries = m.program_decoder.query_embed.weight.unsqueeze(1).repeat(1, b, 1)
    qst_feats = m.program_decoder.coarse_decoder(tgt=queries, memory=enc)
    flat = qst_feats.view(b, NINS, 512).flatten(1)
    lang = m.qsts_reduction(flat)
    instr = m.instr_reduction(qst_feats)          # [NINS, 1, C]

    x_enc, e_enc = m.scene_graph_encoder(nt, bb, ei, et, sym, bvec)

    h = x_enc
    src, dst = ei
    for i in range(NINS):
        ins = instr[i]                            # [1, C]
        conv = m.gat_seq.convs[i]
        if i < NINS - 1:
            conv_res, _ = conv(h, ei, e_enc, ins, bvec)
        else:
            # masked layer: head (masking.py:132-176) + dst-only edge
            # mask + conv message math (mgat_v2_conv.py:243-279)
            x = torch.nn.functional.gelu(h * ins[bvec])
            mask_mod = conv.mask
            xq = mask_mod.node_nn(x)              # [N, C]
            uq = mask_mod.ques_nn(lang)           # [1, C] (B=1: no scramble)
            gate = torch.bmm(xq.unsqueeze(1),
                             uq[bvec].unsqueeze(2)).squeeze(-1)
            gate = gate / math.sqrt(torch.tensor(float(xq.size(1))))
            gate = torch.nn.functional.gelu(gate)            # [N, 1]
            dense = gate.squeeze(-1).unsqueeze(0)            # [1, N]
            g_std = torch.tensor(noise_np, dtype=torch.float32)
            if sampler_type == "gumbel":
                msk = gumbel_sample_torch(dense, g_std.view(1, n), K)
            elif sampler_type == "imle":
                msk = IMLETorch.apply(dense, 0.3 * g_std.view(1, 1, n),
                                      K, 1.0, 10.0, 1.0, 1.0)
            elif sampler_type == "aimle":
                msk = AIMLETorch.apply(dense, 0.3 * g_std.view(1, 1, n),
                                       K, 1.0, 1.0, 1.0, aimle_state)
            else:
                raise ValueError(sampler_type)
            mask = msk[0].unsqueeze(-1)                      # [N, 1]
            emask = NodeMaskToEdgeMaskFn.apply(mask, src, dst)
            H = conv.heads
            x_l = conv.lin_l(x).view(-1, H, C)
            x_r = conv.lin_r(x).view(-1, H, C)
            mm = x_l[src] + x_r[dst] + conv.lin_edge(e_enc).view(-1, H, C)
            mm = mm * emask.unsqueeze(-1)
            mm = torch.nn.functional.leaky_relu(mm, 0.2)
            mm = mm * emask.unsqueeze(-1)
            alpha = (mm * conv.att).sum(dim=-1)
            alpha = segment_softmax(alpha, dst, n)
            w = alpha * emask
            msg = x_l[src] * w.unsqueeze(-1)
            conv_res = (scatter_add(msg, dst, n).reshape(-1, H * C)
                        + conv.bias)
        conv_res = m.gat_seq.x_proj[i](conv_res)
        conv_res = sdp_ref(ins, conv_res, conv_res, bvec)
        conv_res = m.gat_seq.bns[i](conv_res, bvec)
        h = conv_res + h

    g_pool, _ = m.graph_global_attention_pooling(h, lang, bvec,
                                                 node_mask=mask)
    fused = torch.cat([g_pool, lang, g_pool * lang], 1)
    fused = m.embedding(fused)
    logits = m.logit_fc(fused)
    return torch.nn.functional.cross_entropy(logits, label)


# ----------------------------------------------------------------- fixture

def _exact_cap_batches(cfg, vocab, answers, n_steps):
    """n_steps single-sample batches whose graphs hold exactly CAP
    nodes (zero node-padding; see module docstring)."""
    rng = np.random.default_rng(42)
    body = [t for t in vocab.itos[5:] if not t.startswith("<")]
    third = max(len(body) // 3, 1)
    names, attrs = body[:third], body[third:2 * third]
    rels = body[2 * third:]
    graphs = {
        f"img{i}": _random_scene_graph(rng, names, attrs, rels,
                                       n_nodes=CAP, max_rel=2)
        for i in range(n_steps)
    }
    store = SceneGraphStore(vocab, graphs=graphs)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    spec = BucketSpec(batch_size=1, max_nodes_per_graph=CAP,
                      max_edges_per_graph=cfg.max_edges_per_graph,
                      question_len=cfg.question_len)
    coll = Collator(tok, spec, vocab=vocab)
    batches = []
    for i in range(n_steps):
        s = Sample(question_id=f"q{i}", graph=store.query(f"img{i}"),
                   question=f"what is next to the {names[i % len(names)]}?",
                   qst_type={}, label=int(rng.integers(0, len(answers))),
                   image_id=f"img{i}")
        batch, _ = coll.collate([s])
        assert int(np.asarray(batch.node_mask).sum()) == CAP
        batches.append(batch)
    return batches


def _build_pair(sampler_type):
    cfg = small_cfg(
        sampler_type=sampler_type, sample_k=K, batch_size=1,
        mgat_masks=(1.0, 1.0, 1.0, 0.15),
        max_nodes_per_graph=CAP, max_edges_per_graph=256,
        bucket_node_caps=(), use_pallas=False,
        dropout=0.0, head_dropout=0.0, mask_dropout=0.0,
        epochs=2, lr=BASE_LR,
    )
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    batches = _exact_cap_batches(cfg, vocab, answers, N_STEPS)

    torch.manual_seed(0)
    m = TorchRefISubGVQA(cfg.text_vocab_size, len(vocab), cfg.num_answers)
    conv3 = m.gat_seq.convs[NINS - 1]
    conv3.mask = torch.nn.Module()
    conv3.mask.node_nn = torch.nn.Sequential(
        torch.nn.Linear(C, C), torch.nn.GELU())
    conv3.mask.ques_nn = torch.nn.Sequential(
        torch.nn.Linear(C, C), torch.nn.GELU())
    # zero every torch dropout (masking/fusion/transformer)
    for mod in m.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    m.train()

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params, stats = convert_state_dict(sd)
    model = build_model(cfg, vocab)
    return cfg, m, model, params, stats, batches


# ------------------------------------------------------------------- test

@pytest.mark.parametrize("sampler_type", ["gumbel", "imle", "aimle"])
def test_trajectory_matches_torch(sampler_type, monkeypatch):
    cfg, m, model, params, stats, batches = _build_pair(sampler_type)

    noise_rng = np.random.default_rng(777)
    # standard Gumbel = -log(-log(U)); one [CAP] draw per step
    u = noise_rng.uniform(1e-9, 1.0 - 1e-9, size=(N_STEPS, CAP))
    noises = (-np.log(-np.log(u))).astype(np.float32)

    # ---- JAX side: real Trainer-step machinery, run eagerly so the
    # patched jax.random.gumbel is honored per step
    optimizer = make_optimizer(BASE_LR, STEPS_PER_EPOCH,
                               warmup_epochs=10, warmup_start_lr=1e-6,
                               gamma=0.98, grad_clip_norm=2.0)
    state = create_train_state(model, optimizer, batches[0], cfg)
    state = state.replace(params=params, batch_stats=stats,
                          opt_state=optimizer.init(params))
    train_step = make_train_step(model, optimizer, cfg)

    consumed = {"i": 0}
    real_gumbel = jax.random.gumbel

    def fake_gumbel(key, shape=(), dtype=jnp.float32):
        arr = noises[consumed["i"]]
        consumed["i"] += 1
        assert int(np.prod(shape)) == arr.size, \
            f"unexpected gumbel draw shape {shape}"
        return jnp.asarray(arr, dtype).reshape(shape)

    params0 = params   # converter-shared init (for delta comparison)
    monkeypatch.setattr(jax.random, "gumbel", fake_gumbel)
    losses_j, gnorms_j = [], []
    rng = jax.random.PRNGKey(0)
    for s in range(N_STEPS):
        state, metrics = train_step(state, batches[s], rng)
        losses_j.append(float(metrics["loss_sum"] / metrics["count"]))
        gnorms_j.append(float(metrics["grad_norm"]))
    monkeypatch.setattr(jax.random, "gumbel", real_gumbel)
    assert consumed["i"] == N_STEPS, "one sampler draw per step expected"

    # ---- torch side: Adam + per-step lr from the same schedule
    opt = torch.optim.Adam(m.parameters(), lr=lr_at(0), betas=(0.9, 0.999),
                           eps=1e-8)
    aimle_state = {"beta": 0.0, "grad_norm": 1.0, "prev_update": 0.0}
    losses_t, gnorms_t = [], []
    for s in range(N_STEPS):
        for gparam in opt.param_groups:
            gparam["lr"] = lr_at(s)
        loss = torch_forward_train(m, batches[s], None, sampler_type,
                                   noises[s], aimle_state)
        opt.zero_grad()
        loss.backward()
        total_norm = torch.nn.utils.clip_grad_norm_(m.parameters(), 2.0)
        opt.step()
        losses_t.append(float(loss.detach()))
        gnorms_t.append(float(total_norm))

    # ---- per-step losses track within fp32 forward noise (the golden
    # full-model test pins single-forward logits to ~2e-3 abs — loss
    # inherits that scale; what matters here is NO step-over-step
    # divergence growth, i.e. the discrete masks and update directions
    # stayed identical)
    np.testing.assert_allclose(losses_j, losses_t, rtol=3e-3, atol=3e-4)
    # ---- per-step pre-clip gradient norms agree (direct per-step
    # gradient comparison; discrete-mask or STE divergence would blow
    # these apart immediately)
    np.testing.assert_allclose(gnorms_j, gnorms_t, rtol=2e-2)

    # ---- AIMLE adaptive state evolved identically
    if sampler_type == "aimle":
        st_j = state.aimle_states[NINS - 1]
        assert abs(float(st_j.beta) - aimle_state["beta"]) < 1e-9
        np.testing.assert_allclose(float(st_j.grad_norm),
                                   aimle_state["grad_norm"], rtol=1e-5)

    # ---- optimizer-trajectory parity: compare Adam's FIRST MOMENT
    # (the EMA of the clipped gradients) after N steps.  Raw parameter
    # deltas are the wrong metric under Adam: coordinates whose true
    # gradient is pure fp32 noise still receive full ±lr·m̂/√v̂ updates
    # (sign noise), so whole-vector delta cosine is ~0.5 even for
    # perfectly matching runs.  The first moment accumulates the
    # actual gradient VECTORS — noise coordinates stay near zero — so
    # direction + magnitude agreement is decisive: one diverged mask
    # or schedule step would break it immediately.
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params_t, stats_t = convert_state_dict(sd)
    flat_j = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    flat_t = dict(jax.tree_util.tree_flatten_with_path(params_t)[0])
    assert set(map(jax.tree_util.keystr, flat_j)) == \
        set(map(jax.tree_util.keystr, flat_t))

    n_total = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    # the flat optimizer (optax.flatten) keeps exactly two full-length
    # vectors in its state: Adam's mu and nu; nu (second moment) is
    # elementwise non-negative, mu is not
    full = [np.asarray(leaf) for leaf in
            jax.tree_util.tree_leaves(state.opt_state)
            if getattr(leaf, "size", 0) == n_total]
    assert len(full) == 2, f"expected flat (mu, nu), got {len(full)}"
    mu_j = next(v for v in full if np.any(v < 0))

    # torch Adam exp_avg, pushed through the same converter transforms
    # (they are linear) and raveled in the same tree order optax.flatten
    # uses (jax.flatten_util.ravel_pytree of the params tree)
    sd_m = dict(sd)
    name_of = {p: n for n, p in m.named_parameters()}
    for p, st in opt.state.items():
        sd_m[name_of[p]] = st["exp_avg"].numpy()
    mu_tree_t, _ = convert_state_dict(sd_m)
    mu_t = np.asarray(jax.flatten_util.ravel_pytree(mu_tree_t)[0])

    nj, nt = np.linalg.norm(mu_j), np.linalg.norm(mu_t)
    assert nj > 0 and nt > 0, "optimizer first moment never updated"
    cos = float(np.dot(mu_j, mu_t) / (nj * nt))
    # threshold calibrated against measured fp32 cross-framework noise:
    # matching runs land at ~0.987 (attention q/k backward is a
    # cancellation of near-equal terms, so ~1e-4 forward noise amplifies
    # to ~1e-2 on those leaves); ONE diverged mask/schedule step drops
    # the cosine to ~0.5-0.7 (measured during development), so 0.95
    # separates the regimes decisively
    assert cos > 0.95, f"gradient trajectories diverged: cosine {cos}"
    assert 0.95 < nj / nt < 1.05, \
        f"gradient magnitudes diverged: |mu_j|/|mu_t| = {nj / nt}"
    # and the parameters did actually move away from the shared init
    flat_0 = dict(jax.tree_util.tree_flatten_with_path(params0)[0])
    moved = max(float(np.abs(np.asarray(flat_j[p])
                             - np.asarray(flat_0[p])).max())
                for p in flat_j)
    assert moved > 0, "parameters did not move"

    # ---- BatchNorm running stats evolved identically too
    flat_js = dict(jax.tree_util.tree_flatten_with_path(state.batch_stats)[0])
    flat_ts = dict(jax.tree_util.tree_flatten_with_path(stats_t)[0])
    for path, leaf_t in flat_ts.items():
        np.testing.assert_allclose(
            np.asarray(flat_js[path]), np.asarray(leaf_t),
            rtol=2e-3, atol=1e-4,
            err_msg=f"batch stat diverged at {jax.tree_util.keystr(path)}")
