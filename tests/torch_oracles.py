"""PyTorch oracle implementations used ONLY as golden-value generators in
tests. These re-state the *semantics* documented in SURVEY.md §2 (and cited
to reference file:line in each docstring) in a deliberately different,
functional style so our JAX ops can be checked for numerical parity.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


# ---- attentive stats pooling (reference pooling.py:15-28) -----------------

def pooling_oracle(x, w1, b1, w2, b2, mask=None):
    x = t(x)
    scores = F.linear(torch.tanh(F.linear(x, t(w1).T, t(b1))), t(w2).T, t(b2)).squeeze(-1)
    if mask is not None:
        scores = scores.masked_fill(t(mask) == 0, float("-inf"))
    attn = torch.softmax(scores, dim=-1).unsqueeze(-1)
    mean = torch.sum(attn * x, dim=1)
    var = torch.sum(attn * (x - mean.unsqueeze(1)) ** 2, dim=1)
    return torch.cat([mean, torch.sqrt(var + 1e-6)], dim=-1).numpy()


# ---- torch MultiheadAttention golden (cross_attention.py:18-25) -----------

def make_torch_mha(embed_dim, num_heads, seed=0):
    torch.manual_seed(seed)
    m = torch.nn.MultiheadAttention(embed_dim, num_heads, dropout=0.0, batch_first=True)
    m.eval()
    return m


def mha_params_from_torch(m):
    """Extract our q/k/v/out pytree from a torch MultiheadAttention."""
    E = m.embed_dim
    w = m.in_proj_weight.detach().numpy()
    b = m.in_proj_bias.detach().numpy()
    return {
        "q": {"kernel": w[:E].T.copy(), "bias": b[:E].copy()},
        "k": {"kernel": w[E:2 * E].T.copy(), "bias": b[E:2 * E].copy()},
        "v": {"kernel": w[2 * E:].T.copy(), "bias": b[2 * E:].copy()},
        "out": {"kernel": m.out_proj.weight.detach().numpy().T.copy(),
                "bias": m.out_proj.bias.detach().numpy().copy()},
    }


# ---- gated fusion (fusion.py:18-25) ---------------------------------------

def fusion_oracle(a_vec, t_vec, p):
    """p: dict of numpy kernels/biases in our layout ([in,out] kernels)."""
    a_vec, t_vec = t(a_vec), t(t_vec)

    def lin(name, x):
        return F.linear(x, t(p[name]["kernel"]).T, t(p[name]["bias"]))

    a = lin("proj_a2", F.relu(lin("proj_a1", a_vec)))
    tt = lin("proj_t2", F.relu(lin("proj_t1", t_vec)))
    wa = torch.sigmoid(lin("gate_a2", F.relu(lin("gate_a1", a))))
    wt = torch.sigmoid(lin("gate_t2", F.relu(lin("gate_t1", tt))))
    wsum = wa + wt + 1e-8
    return ((wa / wsum) * a + (wt / wsum) * tt).numpy()


# ---- losses (losses.py) ----------------------------------------------------

def label_smoothing_ce_oracle(logits, target, smoothing=0.1):
    logits = t(logits).clamp(-10.0, 10.0)
    target = torch.from_numpy(np.asarray(target)).long()
    n = logits.size(-1)
    logp = torch.nan_to_num(F.log_softmax(logits, dim=-1), neginf=-1e9)
    true = torch.full_like(logp, smoothing / (n - 1))
    true.scatter_(1, target.unsqueeze(1), 1.0 - smoothing)
    loss = torch.mean(torch.sum(-true * logp, dim=-1))
    return float(loss)


def focal_oracle(logits, targets, num_classes, beta=0.9999, gamma=2.0):
    logits = t(logits)
    targets = torch.from_numpy(np.asarray(targets)).long()
    counts = torch.bincount(targets, minlength=num_classes).float().clamp(min=1.0)
    eff = (1.0 - torch.pow(torch.tensor(beta), counts)).clamp(min=1e-6)
    w = (1.0 - beta) / eff
    w = w / (w.sum() + 1e-8) * num_classes
    logits = logits.clamp(-10.0, 10.0)
    probs = F.softmax(logits, dim=-1)
    pt = probs.gather(1, targets.unsqueeze(1)).squeeze(1).clamp(1e-6, 1.0)
    ce = F.cross_entropy(logits, targets, reduction="none", weight=w)
    return float(((1 - pt) ** gamma * ce).mean())


def supcon_oracle(features, labels, temperature=0.07):
    f = F.normalize(t(features), dim=-1)
    labels = torch.from_numpy(np.asarray(labels)).long()
    logits = f @ f.T / temperature
    logits = logits - logits.max(dim=1, keepdim=True)[0]
    mask = torch.eq(labels.unsqueeze(1), labels.unsqueeze(0)).float()
    lm = 1.0 - torch.eye(f.size(0))
    mask = mask * lm
    exp_logits = torch.exp(logits) * lm
    log_prob = logits - torch.log(exp_logits.sum(dim=1, keepdim=True) + 1e-12)
    mlpp = (mask * log_prob).sum(dim=1) / (mask.sum(dim=1) + 1e-12)
    return float(-mlpp.mean())


def prototype_loss_oracle(embeddings, labels, prototypes, margin=0.5):
    emb = t(embeddings).clamp(-10.0, 10.0)
    protos = t(prototypes)
    labels = torch.from_numpy(np.asarray(labels)).long()
    pos = torch.norm(emb - protos[labels], dim=1).mean()
    sq = torch.sum((emb.unsqueeze(1) - protos.unsqueeze(0)) ** 2, dim=2)
    dists = torch.sqrt(sq + 1e-6)
    B = emb.shape[0]
    pm = torch.zeros_like(dists).bool()
    pm[torch.arange(B), labels] = True
    neg_d = dists.masked_fill(pm, float("inf")).clamp(max=10.0)
    neg = (-torch.logsumexp(-neg_d, dim=1)).mean()
    return float(pos + margin - neg)


# ---- openmax (classifier.py:240-305) ---------------------------------------

def openmax_oracle(features, logits, alpha, beta, tau, av):
    feats, logits = t(features), t(logits)
    B, C = logits.shape
    dists = torch.zeros(B, C)
    for i in range(C):
        dists[:, i] = torch.norm(feats - t(av)[i], dim=1)
    unknown = torch.zeros(B)
    for i in range(C):
        sb = torch.clamp(t(beta)[i], min=1e-6)
        sx = torch.clamp(dists[:, i] - t(tau)[i], min=0)
        cdf = 1 - torch.exp(-torch.pow(sx / sb, t(alpha)[i]))
        unknown = torch.maximum(unknown, cdf)
    adj = logits.clone()
    for i in range(B):
        if unknown[i] > 0.3:
            adj[i] = adj[i] * (1 - unknown[i] * 0.8)
    return adj.numpy()


def fit_weibull_oracle(features, labels, num_classes):
    feats = t(features)
    labels = torch.from_numpy(np.asarray(labels)).long()
    alpha = torch.ones(num_classes)
    beta = torch.ones(num_classes)
    tau = torch.zeros(num_classes)
    av = torch.zeros(num_classes, feats.shape[1])
    for c in range(num_classes):
        m = labels == c
        if m.sum() == 0:
            continue
        cf = feats[m]
        mu = cf.mean(dim=0)
        av[c] = mu
        d = torch.norm(cf - mu, dim=1).numpy()
        alpha[c] = 2.5
        beta[c] = float(d.std()) * 1.5
        tau[c] = float(d.min()) * 0.8
    return alpha.numpy(), beta.numpy(), tau.numpy(), av.numpy()


# ---- deep classifier runtime path (classifier.py:200-238) ------------------

def classifier_oracle(x, p):
    """Full AdvancedOpenMaxClassifier runtime traversal (eval mode, no
    dropout) from our param pytree (numpy, kernels [in,out])."""
    import torch

    def lin(q, h):
        return F.linear(h, t(q["kernel"]).T, t(q["bias"]))

    def ln(q, h):
        return F.layer_norm(h, (h.shape[-1],), t(q["scale"]), t(q["bias"]))

    h = t(x)
    h = F.relu(ln(p["input_ln"], lin(p["input_proj"], h)))
    L = p["layers"]["ln_pre"]["scale"].shape[0]
    for i in range(L):
        layer = {k1: {k2: v2[i] for k2, v2 in v1.items()}
                 for k1, v1 in p["layers"].items()}
        h = ln(layer["ln_pre"], h)
        b = ln(layer["block_ln"], h)
        b = lin(layer["block_lin2"], F.relu(lin(layer["block_lin1"], b)))
        h = h + b
    feats = F.relu(ln(p["out_ln"], lin(p["out_proj1"], h)))
    logits = lin(p["out_proj2"], feats)

    a = p["anchor"]
    proj = F.relu(ln(a["proj_ln"], lin(a["projection"], feats)))
    proj = F.normalize(proj, p=2, dim=1)
    anchors = F.normalize(t(a["class_anchors"]), p=2, dim=1)
    sims = proj @ anchors.T / float(a["temperature"])

    u = p["uncertainty"]
    unc = torch.sigmoid(lin(u["lin2"], F.relu(lin(u["lin1"], feats))))
    return logits.numpy(), feats.numpy(), sims.numpy(), unc.numpy()
