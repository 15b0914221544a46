"""Torch oracles for parity testing.

These re-create the reference architectures (see SURVEY.md §2.4-2.7) from
their behavioral spec using stock torch modules, load weights exported
from echr_tpu param trees, and serve as the ground truth the JAX path is
gated against (eval mode, fp32).  Independent implementations — structure
follows the spec, not the reference source.
"""
import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


# ---------------------------------------------------------------------------
# SST
# ---------------------------------------------------------------------------


class SSTOracle(nn.Module):
    """2-layer LSTM over [T, D] + Linear(H, K) + sigmoid (spec: sst_model.py)."""

    def __init__(self, params, video_dim, hidden_dim, K, num_layers=2):
        super().__init__()
        self.rnn = nn.LSTM(video_dim, hidden_dim, num_layers, batch_first=True, dropout=0.0)
        self.scores = nn.Linear(hidden_dim, K)
        sd = {}
        for l, lp in enumerate(params["rnn"]):
            sd[f"weight_ih_l{l}"] = t(lp["w_ih"]).T.contiguous()
            sd[f"weight_hh_l{l}"] = t(lp["w_hh"]).T.contiguous()
            sd[f"bias_ih_l{l}"] = t(lp["b_ih"])
            sd[f"bias_hh_l{l}"] = t(lp["b_hh"])
        self.rnn.load_state_dict(sd)
        self.scores.load_state_dict(
            {"weight": t(params["scores"]["w"]).T.contiguous(), "bias": t(params["scores"]["b"])}
        )

    @torch.no_grad()
    def forward(self, feats):
        out, _ = self.rnn(feats.unsqueeze(0))
        h = out.squeeze(0)
        return h, torch.sigmoid(self.scores(h))


# ---------------------------------------------------------------------------
# TSRM
# ---------------------------------------------------------------------------


class TSRMOracle(nn.Module):
    """Grouped QK relation attention with sinusoid pairwise position affinity
    (spec: MA_attention_8_NEW.py; fST0 multiply combine, no V projection,
    grouped 1x1 output conv)."""

    def __init__(self, params, in_dim, d=512, group=16, d_o=512, fst="fST0", use_posit=True):
        super().__init__()
        self.d, self.group, self.d_o, self.fst, self.use_posit = d, group, d_o, fst, use_posit
        self.event_emb = nn.Linear(in_dim, d)
        self.query = nn.Linear(d, d)
        self.key = nn.Linear(d, d)
        self.fc1 = nn.Linear(d, d)
        self.fc2 = nn.Linear(d, group)
        self.out = nn.Conv2d(group * d, d_o, kernel_size=1, groups=group)

        def load_lin(mod, p):
            mod.load_state_dict({"weight": t(p["w"]).T.contiguous(), "bias": t(p["b"])})

        load_lin(self.event_emb, params["event_emb"])
        load_lin(self.query, params["query"])
        load_lin(self.key, params["key"])
        if use_posit:
            load_lin(self.fc1, params["pair_pos_fc1"])
            load_lin(self.fc2, params["pair_pos_fc2"])
        # out_w [g, d, d_o/g] -> conv weight [d_o, d, 1, 1] with group-block rows
        w = np.asarray(params["out_w"])  # [g, d, og]
        conv_w = np.transpose(w, (0, 2, 1)).reshape(self.d_o, self.d, 1, 1)
        self.out.load_state_dict(
            {"weight": t(conv_w), "bias": t(params["out_b"])}
        )

    @staticmethod
    def position_embedding(soi, feat_dim):
        # float64 host math, like the reference's numpy path
        soi = np.asarray(soi, dtype=np.float64)
        s, e = soi[:, 0], soi[:, 1]
        center, length = 0.5 * (s + e), (e - s)
        dc = np.maximum(np.abs((center[:, None] - center[None, :]) / length[:, None]), 1e-3)
        dl = np.log(length[None, :] / length[:, None])
        pos = np.stack([dc, dl], axis=2)  # [N, N, 2]
        nf = feat_dim // 4
        dim_mat = np.power(10000.0, (4.0 / feat_dim) * np.arange(nf))
        div = (100.0 * pos)[..., None] / dim_mat
        emb = np.concatenate([np.sin(div), np.cos(div)], axis=3)
        return emb.reshape(soi.shape[0], soi.shape[0], feat_dim)

    @torch.no_grad()
    def forward(self, feats, soi, pos_emb=None):
        N = feats.shape[0]
        g, d = self.group, self.d
        dg = d // g
        x = self.event_emb(feats)
        q = self.query(x).view(N, g, dg).transpose(0, 1)  # [g, N, dg]
        k = self.key(x).view(N, g, dg).transpose(0, 1)
        aff = torch.bmm(q, k.transpose(1, 2)) / math.sqrt(dg)  # [g, N, N]
        aff = aff.transpose(0, 1)  # [N, g, N]
        if self.use_posit:
            emb = t(pos_emb) if pos_emb is not None else t(self.position_embedding(soi, d))
            aw = self.fc2(torch.tanh(self.fc1(emb.view(-1, d)))).view(N, N, g)
            aw = aw.transpose(1, 2)  # [N, g, N]
            if self.fst == "fST0":
                aff = aw * aff
            elif self.fst == "fST1":
                aff = aw + aff
            elif self.fst == "fST2":
                aff = torch.log(aw.clamp(min=1e-6)) + aff
            elif self.fst == "fST3":
                aff = aw
        w = F.softmax(aff, dim=2)
        out = w.reshape(N * g, N).matmul(x)  # [N*g, d]
        out = self.out(out.view(N, g * d, 1, 1))
        return out.squeeze(3).squeeze(2)


# ---------------------------------------------------------------------------
# three-stream decoder (contexts assembled the reference way: ragged windows)
# ---------------------------------------------------------------------------


class ThreeStreamOracle(nn.Module):
    """Three parallel LSTMCells + additive clip attention + concat output,
    with the reference's padded-window clip tensors and softmax-then-
    renormalize attention (spec: OldModel_NEW.py ThreeStream_Core,
    Attention, OldModel wrapper)."""

    def __init__(self, params, cfg):
        super().__init__()
        d = cfg.decoder
        E, H, V = d.CG_input_encoding_size, d.CG_rnn_size, d.CG_vocab_size
        core = params["core"]
        self.H = H
        self.seq_length = d.CG_seq_length
        self.embed = nn.Embedding(V + 1, E)
        self.embed.load_state_dict({"weight": t(params["embed"])})
        self.logit = nn.Linear(3 * H, V + 1)
        self.logit.load_state_dict(
            {"weight": t(params["logit"]["w"]).T.contiguous(), "bias": t(params["logit"]["b"])}
        )

        def cell(p, in_dim):
            c = nn.LSTMCell(in_dim, H)
            c.load_state_dict(
                {
                    "weight_ih": t(p["w_ih"]).T.contiguous(),
                    "weight_hh": t(p["w_hh"]).T.contiguous(),
                    "bias_ih": t(p["b_ih"]),
                    "bias_hh": t(p["b_hh"]),
                }
            )
            return c

        self.layer0 = cell(core["layer0"], cfg.event_context_dim + E)
        self.layer1 = cell(core["layer1"], cfg.clip_context_dim + E)
        self.layer2 = cell(core["layer2"], cfg.video_context_dim + E)
        att = core["attention"]
        self.ctx2att = nn.Linear(cfg.clip_context_dim, d.CG_att_hid_size)
        self.h2att = nn.Linear(H, d.CG_att_hid_size)
        self.alpha_net = nn.Linear(d.CG_att_hid_size, 1)
        for mod, p in [(self.ctx2att, att["ctx2att"]), (self.h2att, att["h2att"]), (self.alpha_net, att["alpha_net"])]:
            mod.load_state_dict({"weight": t(p["w"]).T.contiguous(), "bias": t(p["b"])})

    def attention(self, h, clip, clip_mask):
        N, S, D = clip.shape
        att = self.ctx2att(clip.reshape(-1, D)).view(N, S, -1)
        ah = self.h2att(h).unsqueeze(1).expand_as(att)
        dot = self.alpha_net(torch.tanh(att + ah).view(N * S, -1)).view(N, S)
        w = F.softmax(dot, dim=1)
        w = w * clip_mask
        w = w / w.sum(1, keepdim=True)
        return torch.bmm(w.unsqueeze(1), clip).squeeze(1)

    def step(self, it, video, event, clip, clip_mask, state):
        xt = self.embed(it)
        h, c = state
        pre_h1 = h[1]
        N = event.shape[0]
        v = video.unsqueeze(0).expand(N, -1)
        h0, c0 = self.layer0(torch.cat([xt, event], 1), (h[0], c[0]))
        att = self.attention(pre_h1, clip, clip_mask)
        h1, c1 = self.layer1(torch.cat([xt, att], 1), (h[1], c[1]))
        h2, c2 = self.layer2(torch.cat([xt, v], 1), (h[2], c[2]))
        state = (torch.stack([h0, h1, h2]), torch.stack([c0, c1, c2]))
        out = torch.cat([h0, h1, h2], 1)
        logprobs = F.log_softmax(self.logit(out), dim=1)
        return logprobs, state

    @torch.no_grad()
    def teacher_forced(self, video, event, clip, clip_mask, seq):
        N = event.shape[0]
        z = torch.zeros(3, N, self.H)
        state = (z, z.clone())
        outs = []
        for i in range(seq.shape[1] - 1):
            if i >= 1 and seq[:, i].sum() == 0:
                break
            lp, state = self.step(seq[:, i], video, event, clip, clip_mask, state)
            outs.append(lp)
        return torch.stack(outs, 1)

    @torch.no_grad()
    def sample_greedy(self, video, event, clip, clip_mask):
        N = event.shape[0]
        z = torch.zeros(3, N, self.H)
        state = (z, z.clone())
        it = torch.zeros(N, dtype=torch.long)
        seq, logps = [], []
        unfinished = None
        logprobs, state = self.step(it, video, event, clip, clip_mask, state)
        for tstep in range(1, self.seq_length + 1):
            sample_logp, it = torch.max(logprobs, 1)
            unfinished = (it > 0) if tstep == 1 else unfinished * (it > 0)
            if unfinished.sum() == 0:
                break
            seq.append(it * unfinished.long())
            logps.append(sample_logp)
            logprobs, state = self.step(it, video, event, clip, clip_mask, state)
        if not seq:
            return torch.zeros(N, 0, dtype=torch.long), torch.zeros(N, 0)
        return torch.stack(seq, 1), torch.stack(logps, 1)


def padded_clip_windows(c3d, soi):
    """Build the reference-style padded [N, max_len, D] clip tensor + mask
    (spec: CaptionGenerator.get_clip_context)."""
    soi = np.asarray(soi)
    max_len = int((soi[:, 1] - soi[:, 0]).max())
    N, D = soi.shape[0], c3d.shape[1]
    clip = torch.zeros(N, max_len, D)
    mask = torch.zeros(N, max_len)
    for i, (s, e) in enumerate(soi):
        w = c3d[s:e]
        clip[i, : len(w)] = w
        mask[i, : len(w)] = 1
    return clip, mask


class MultiCoreOracle(nn.Module):
    """Generic torch oracle for the remaining decoder-core family
    (spec: OldModel_NEW.py AllImgCore :276-323, H3/H3_dense/H3_dense_add
    :404-508, TwoStream :511-567, ThreeStream_2stream/_CC/_CLDA :569-760,
    TwoStream_jump :888-941, TwoStream3LSTM :944-1006), loading weights
    from the echr_tpu param tree.  Eval mode (all reference dropouts are
    identity), fp32."""

    NUM_LAYERS = {"h3": 3, "h3_dense": 3, "h3_dense_add": 3,
                  "two_stream": 2, "two_stream_jump": 2, "two_stream_3lstm": 3,
                  "three_stream_2stream": 2, "three_stream_2stream_LDA": 2,
                  "three_stream_2stream_CC": 2}

    def __init__(self, params, cfg):
        super().__init__()
        d = cfg.decoder
        self.cfg = cfg
        self.model = d.caption_model
        E, H, V = d.CG_input_encoding_size, d.CG_rnn_size, d.CG_vocab_size
        self.H = H
        self.L = self.NUM_LAYERS.get(self.model, d.CG_num_layers)
        self.seq_length = d.CG_seq_length
        self.embed = nn.Embedding(V + 1, E)
        self.embed.load_state_dict({"weight": t(params["embed"])})
        logit_w = np.asarray(params["logit"]["w"])
        self.logit = nn.Linear(logit_w.shape[0], V + 1)
        self.logit.load_state_dict(
            {"weight": t(logit_w).T.contiguous(), "bias": t(params["logit"]["b"])})
        core = params["core"]

        def cell(p):
            in_dim, four_h = np.asarray(p["w_ih"]).shape
            c = nn.LSTMCell(in_dim, four_h // 4, bias="b_ih" in p)
            sd = {"weight_ih": t(p["w_ih"]).T.contiguous(),
                  "weight_hh": t(p["w_hh"]).T.contiguous()}
            if "b_ih" in p:
                sd["bias_ih"] = t(p["b_ih"])
                sd["bias_hh"] = t(p["b_hh"])
            c.load_state_dict(sd)
            return c

        if self.model == "all_img":
            # stacked bias-free LSTM (reference AllImgCore :291-292)
            self.layers = nn.ModuleList([cell(p) for p in core["layers"]])
        else:
            self.layer0 = cell(core["layer0"])
            self.layer1 = cell(core["layer1"])
            if "layer2" in core:
                self.layer2 = cell(core["layer2"])
            att = core["attention"]
            self.ctx2att = nn.Linear(np.asarray(att["ctx2att"]["w"]).shape[0],
                                     cfg.decoder.CG_att_hid_size)
            self.h2att = nn.Linear(H, cfg.decoder.CG_att_hid_size)
            self.alpha_net = nn.Linear(cfg.decoder.CG_att_hid_size, 1)
            for mod, p in [(self.ctx2att, att["ctx2att"]), (self.h2att, att["h2att"]),
                           (self.alpha_net, att["alpha_net"])]:
                mod.load_state_dict({"weight": t(p["w"]).T.contiguous(), "bias": t(p["b"])})
        self.init_linear = None
        if "init_linear" in params:
            dim = np.asarray(params["init_linear"]["w"]).shape[0]
            self.init_linear = nn.Linear(dim, self.L * H)
            self.init_linear.load_state_dict(
                {"weight": t(params["init_linear"]["w"]).T.contiguous(),
                 "bias": t(params["init_linear"]["b"])})

    def attention(self, h, clip, clip_mask):
        # reference Attention.forward :376-401: softmax then mask renormalize
        N, S, D = clip.shape
        att = self.ctx2att(clip.reshape(-1, D)).view(N, S, -1)
        ah = self.h2att(h).unsqueeze(1).expand_as(att)
        dot = self.alpha_net(torch.tanh(att + ah).view(N * S, -1)).view(N, S)
        w = F.softmax(dot, dim=1)
        w = w * clip_mask
        w = w / w.sum(1, keepdim=True)
        return torch.bmm(w.unsqueeze(1), clip).squeeze(1)

    def init_state(self, video, event, clip):
        N = event.shape[0]
        if self.init_linear is None:
            z = torch.zeros(self.L, N, self.H)
            return (z, z.clone())
        tt = self.cfg.context.CG_init_feats_type
        parts = []
        if "V" in tt:
            parts.append(video.unsqueeze(0).expand(N, -1))
        if "E" in tt:
            parts.append(event)
        if "C" in tt:
            parts.append(clip.mean(1))  # padded-window mean quirk
        m = self.init_linear(torch.cat(parts, 1)).view(N, self.L, self.H).transpose(0, 1)
        return (m.contiguous(), m.contiguous())

    def core_step(self, xt, video, event, clip, clip_mask, state):
        m = self.model
        h, c = state
        N = event.shape[0]
        v = video.unsqueeze(0).expand(N, -1)
        if m == "all_img":
            tt = self.cfg.context.CG_input_feats_type
            parts = []
            if "V" in tt:
                parts.append(v)
            if "E" in tt:
                parts.append(event)
            if "C" in tt:
                parts.append(clip.mean(1))
            x = torch.cat([xt] + parts, 1)
            hs, cs = [], []
            for l, cell_l in enumerate(self.layers):
                hl, cl = cell_l(x, (h[l], c[l]))
                hs.append(hl)
                cs.append(cl)
                x = hl
            return hs[-1], (torch.stack(hs), torch.stack(cs))
        if m in ("h3", "h3_dense", "h3_dense_add"):
            pre_h = h[-1]
            h0, c0 = self.layer0(torch.cat([xt, v, pre_h], 1), (h[0], c[0]))
            h1, c1 = self.layer1(torch.cat([event, h0], 1), (h[1], c[1]))
            if m == "h3_dense_add":
                h1o = h1 + h0  # residual (dropouts identity at eval)
            else:
                h1o = h1
            att = self.attention(h1o, clip, clip_mask)
            h2, c2 = self.layer2(torch.cat([att, h1o], 1), (h[2], c[2]))
            st = (torch.stack([h0, h1, h2]), torch.stack([c0, c1, c2]))
            if m == "h3":
                return h2, st
            if m == "h3_dense":
                return torch.cat([h0, h1, h2], 1), st
            return h2 + h1o, st  # h3_dense_add
        if m in ("two_stream", "three_stream_2stream"):
            pre_h1 = h[1]
            h0, c0 = self.layer0(torch.cat([xt, event], 1), (h[0], c[0]))
            att = self.attention(pre_h1, clip, clip_mask)
            h1, c1 = self.layer1(torch.cat([xt, att], 1), (h[1], c[1]))
            return torch.cat([h0, h1], 1), (torch.stack([h0, h1]), torch.stack([c0, c1]))
        if m == "two_stream_jump":
            pre_h0, pre_h1 = h[0], h[1]
            h0, c0 = self.layer0(torch.cat([xt, event, pre_h1], 1), (h[0], c[0]))
            att = self.attention(pre_h1, clip, clip_mask)
            h1, c1 = self.layer1(torch.cat([xt, att, pre_h0], 1), (h[1], c[1]))
            return torch.cat([h0, h1], 1), (torch.stack([h0, h1]), torch.stack([c0, c1]))
        if m == "two_stream_3lstm":
            pre_h1 = h[1]
            h2, c2 = self.layer2(torch.cat([xt, v], 1), (h[2], c[2]))
            h0, c0 = self.layer0(torch.cat([h2, event], 1), (h[0], c[0]))
            att = self.attention(pre_h1, clip, clip_mask)
            h1, c1 = self.layer1(torch.cat([h2, att], 1), (h[1], c[1]))
            return torch.cat([h0, h1], 1), (torch.stack([h0, h1, h2]), torch.stack([c0, c1, c2]))
        if m == "three_stream_2stream_LDA":
            pre_h1 = h[1]
            h0, c0 = self.layer0(torch.cat([xt, v], 1), (h[0], c[0]))
            att = self.attention(pre_h1, clip, clip_mask)
            h1, c1 = self.layer1(torch.cat([xt, att], 1), (h[1], c[1]))
            return torch.cat([h0, h1], 1), (torch.stack([h0, h1]), torch.stack([c0, c1]))
        if m == "three_stream_2stream_CC":
            pre_h1 = h[1]
            att = self.attention(pre_h1, clip, clip_mask)
            h0, c0 = self.layer0(torch.cat([xt, att], 1), (h[0], c[0]))
            h1, c1 = self.layer1(torch.cat([xt, att], 1), (h[1], c[1]))
            return torch.cat([h0, h1], 1), (torch.stack([h0, h1]), torch.stack([c0, c1]))
        raise ValueError(m)

    def step(self, it, video, event, clip, clip_mask, state):
        xt = self.embed(it)
        out, state = self.core_step(xt, video, event, clip, clip_mask, state)
        return F.log_softmax(self.logit(out), dim=1), state

    @torch.no_grad()
    def teacher_forced(self, video, event, clip, clip_mask, seq):
        state = self.init_state(video, event, clip)
        outs = []
        for i in range(seq.shape[1] - 1):
            if i >= 1 and seq[:, i].sum() == 0:
                break
            lp, state = self.step(seq[:, i], video, event, clip, clip_mask, state)
            outs.append(lp)
        return torch.stack(outs, 1)

    @torch.no_grad()
    def sample_greedy(self, video, event, clip, clip_mask):
        N = event.shape[0]
        state = self.init_state(video, event, clip)
        it = torch.zeros(N, dtype=torch.long)
        seq, logps = [], []
        unfinished = None
        logprobs, state = self.step(it, video, event, clip, clip_mask, state)
        for tstep in range(1, self.seq_length + 1):
            sample_logp, it = torch.max(logprobs, 1)
            unfinished = (it > 0) if tstep == 1 else unfinished * (it > 0)
            if unfinished.sum() == 0:
                break
            seq.append(it * unfinished.long())
            logps.append(sample_logp)
            logprobs, state = self.step(it, video, event, clip, clip_mask, state)
        if not seq:
            return torch.zeros(N, 0, dtype=torch.long), torch.zeros(N, 0)
        return torch.stack(seq, 1), torch.stack(logps, 1)


class ShowAttendTellOracle(nn.Module):
    """Single/stacked no-bias LSTM with inline additive attention and
    selected-context inputs (spec: OldModel_NEW.py ShowAttendTellCore +
    OldModel wrapper; input_feats per CG_input_feats_type, init state from
    CG_init_feats_type)."""

    def __init__(self, params, cfg):
        super().__init__()
        d = cfg.decoder
        E, H, V = d.CG_input_encoding_size, d.CG_rnn_size, d.CG_vocab_size
        self.cfg = cfg
        self.H, self.L = H, d.CG_num_layers
        self.seq_length = d.CG_seq_length
        self.embed = nn.Embedding(V + 1, E)
        self.embed.load_state_dict({"weight": t(params["embed"])})
        self.logit = nn.Linear(H, V + 1)
        self.logit.load_state_dict(
            {"weight": t(params["logit"]["w"]).T.contiguous(), "bias": t(params["logit"]["b"])}
        )
        core = params["core"]
        in_dim = E + self._input_dim(cfg)
        self.rnn = nn.LSTM(in_dim, H, d.CG_num_layers, bias=False)
        sd = {}
        for l, lp in enumerate(core["layers"]):
            sd[f"weight_ih_l{l}"] = t(lp["w_ih"]).T.contiguous()
            sd[f"weight_hh_l{l}"] = t(lp["w_hh"]).T.contiguous()
        self.rnn.load_state_dict(sd)
        att = core["attention"]
        self.ctx2att = nn.Linear(cfg.clip_context_dim, d.CG_att_hid_size)
        self.h2att = nn.Linear(H, d.CG_att_hid_size)
        self.alpha_net = nn.Linear(d.CG_att_hid_size, 1)
        for mod, p in [(self.ctx2att, att["ctx2att"]), (self.h2att, att["h2att"]),
                       (self.alpha_net, att["alpha_net"])]:
            mod.load_state_dict({"weight": t(p["w"]).T.contiguous(), "bias": t(p["b"])})
        # init_linear (CG_init_feats_type non-empty)
        self.init_linear = None
        if "init_linear" in params:
            dim = params["init_linear"]["w"].shape[0]
            self.init_linear = nn.Linear(dim, self.L * H)
            self.init_linear.load_state_dict(
                {"weight": t(params["init_linear"]["w"]).T.contiguous(),
                 "bias": t(params["init_linear"]["b"])}
            )

    def _input_dim(self, cfg):
        tt = cfg.context.CG_input_feats_type
        d = 0
        if "V" in tt:
            d += cfg.video_context_dim
        if "E" in tt:
            d += cfg.event_context_dim
        if "C" in tt:
            d += cfg.clip_context_dim
        return d

    def init_state(self, video, event, clip, clip_mask):
        N = event.shape[0]
        if self.init_linear is None:
            z = torch.zeros(self.L, N, self.H)
            return (z, z.clone())
        tt = self.cfg.context.CG_init_feats_type
        parts = []
        if "V" in tt:
            parts.append(video.unsqueeze(0).expand(N, -1))
        if "E" in tt:
            parts.append(event)
        if "C" in tt:
            parts.append(clip.mean(1))  # padded-window mean (reference quirk)
        m = self.init_linear(torch.cat(parts, 1)).view(N, self.L, self.H).transpose(0, 1)
        return (m.contiguous(), m.contiguous())

    def attention(self, h, clip, clip_mask):
        N, S, D = clip.shape
        att = self.ctx2att(clip.reshape(-1, D)).view(N, S, -1)
        ah = self.h2att(h).unsqueeze(1).expand_as(att)
        dot = self.alpha_net(torch.tanh(att + ah).view(N * S, -1)).view(N, S)
        w = F.softmax(dot, dim=1)
        w = w * clip_mask
        w = w / w.sum(1, keepdim=True)
        return torch.bmm(w.unsqueeze(1), clip).squeeze(1)

    def step(self, it, video, event, clip, clip_mask, state):
        xt = self.embed(it)
        att = self.attention(state[0][-1], clip, clip_mask)
        tt = self.cfg.context.CG_input_feats_type
        N = event.shape[0]
        parts = []
        if "V" in tt:
            parts.append(video.unsqueeze(0).expand(N, -1))
        if "E" in tt:
            parts.append(event)
        if "C" in tt:
            parts.append(att)
        x = torch.cat([xt] + parts, 1) if parts else xt
        out, state = self.rnn(x.unsqueeze(0), state)
        logprobs = F.log_softmax(self.logit(out.squeeze(0)), dim=1)
        return logprobs, state

    @torch.no_grad()
    def sample_greedy(self, video, event, clip, clip_mask):
        N = event.shape[0]
        state = self.init_state(video, event, clip, clip_mask)
        it = torch.zeros(N, dtype=torch.long)
        seq, logps = [], []
        unfinished = None
        logprobs, state = self.step(it, video, event, clip, clip_mask, state)
        for tstep in range(1, self.seq_length + 1):
            sample_logp, it = torch.max(logprobs, 1)
            unfinished = (it > 0) if tstep == 1 else unfinished * (it > 0)
            if unfinished.sum() == 0:
                break
            seq.append(it * unfinished.long())
            logps.append(sample_logp)
            logprobs, state = self.step(it, video, event, clip, clip_mask, state)
        if not seq:
            return torch.zeros(N, 0, dtype=torch.long), torch.zeros(N, 0)
        return torch.stack(seq, 1), torch.stack(logps, 1)
