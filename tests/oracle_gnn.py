"""Numpy re-execution of the reference GNN semantics (forward, hand
backward, Adam) for parity testing — the "per-layer allclose" gate from
BASELINE.md. Mirrors gcn_layer.cpp / sage_layer.cpp / gat_aggregator.cpp
/ softmax_loss_layer.cpp / optimizer.cpp step by step, in float64 for a
tight oracle."""

import numpy as np


def spmm_np(g, w, x):
    out = np.zeros((g.nv, x.shape[1]))
    src, dst = g.coo()
    for e in range(g.ne):
        out[src[e]] += w[e] * x[dst[e]]
    return out


def softmax_np(v):
    e = np.exp(v - v.max())
    return e / e.sum()


class AdamNp:
    """optimizer.cpp:22-33: b1_t/b2_t start at b1/b2, eps inside sqrt."""

    def __init__(self, lr):
        self.lr, self.b1, self.b2, self.eps = lr, 0.9, 0.999, 1e-8
        self.b1_t, self.b2_t = 0.9, 0.999
        self.m, self.v = {}, {}

    def update(self, name, dW, W):
        m = self.m.setdefault(name, np.zeros_like(W))
        v = self.v.setdefault(name, np.zeros_like(W))
        m[:] = self.b1 * m + (1 - self.b1) * dW
        v[:] = self.b2 * v + (1 - self.b2) * dW * dW
        W -= self.lr * (m / (1 - self.b1_t)) / np.sqrt(v / (1 - self.b2_t) + self.eps)

    def end_step(self):
        self.b1_t *= self.b1
        self.b2_t *= self.b2


class GcnOracle:
    """2-to-L-layer GCN, reference semantics, no dropout."""

    def __init__(self, g, edge_w, dims, weights, lr, begin, end, labels, mask):
        # dims: [(din, dout, act), ...]; weights: list of W_neigh arrays
        self.g, self.w = g, edge_w
        self.dims = dims
        self.W = [w.astype(np.float64).copy() for w in weights]
        self.opt = AdamNp(lr)
        self.begin, self.end = begin, end
        self.labels, self.mask = labels, mask

    def forward(self, x):
        acts = []
        h = x.astype(np.float64)
        self.inputs = []
        self.agg_in = []  # in_temp1 when y<=z
        for l, (din, dout, act) in enumerate(self.dims):
            self.inputs.append(h)
            if din > dout:
                t = h @ self.W[l]
                out = spmm_np(self.g, self.w, t)
                self.agg_in.append(None)
            else:
                t = spmm_np(self.g, self.w, h)
                self.agg_in.append(t)
                out = t @ self.W[l]
            if act:
                out = np.maximum(out, 0.0)
            acts.append(out)
            h = out
        return acts

    def loss_and_grad(self, logits):
        nv, ncls = logits.shape
        probs = np.zeros_like(logits)
        ce = np.zeros(nv)
        grad = np.zeros_like(logits)
        denom = self.end - self.begin
        count = 0
        for i in range(self.begin, self.end):
            if self.mask[i]:
                p = softmax_np(logits[i])
                probs[i] = p
                onehot = np.zeros(ncls)
                onehot[self.labels[i]] = 1.0
                pc = np.where(p == 0.0, 1e-10, p)
                ce[i] = -np.sum(onehot * np.log(pc))
                grad[i] = (p - onehot) / denom
                count += 1
        return ce.sum() / count, grad

    def backward_and_update(self, acts, grad_in):
        grads_W = [None] * len(self.dims)
        g_in = grad_in
        for l in reversed(range(len(self.dims))):
            din, dout, act = self.dims[l]
            if act:
                g_in = np.where(acts[l] > 0, g_in, 0.0)
            if din > dout:
                tmp = spmm_np(self.g, self.w, g_in)  # symmetric adjoint
                grads_W[l] = self.inputs[l].T @ tmp
                g_prev = tmp @ self.W[l].T if l > 0 else None
            else:
                grads_W[l] = self.agg_in[l].T @ g_in
                if l > 0:
                    g_prev = spmm_np(self.g, self.w, g_in @ self.W[l].T)
                else:
                    g_prev = None
            g_in = g_prev
        for l in range(len(self.dims)):
            self.opt.update(f"W{l}", grads_W[l], self.W[l])
        self.opt.end_step()
        return grads_W

    def step(self, x):
        acts = self.forward(x)
        loss, grad = self.loss_and_grad(acts[-1])
        self.backward_and_update(acts, grad)
        return loss, acts


class GatOracle:
    """float64 GAT net (gconv stack + l2norm + dense), reference
    semantics from gat_layer.cpp / gat_aggregator.cpp / l2norm_layer.cpp
    / dense_layer.cpp.

    ``full_grad=False`` reproduces gat_aggregator.cpp:103-199 exactly:
    the backward propagates only the VALUE path (update_all with
    transposed norm_scores, :199); the scores' dependence on the
    projected features flows into the alpha gradients (:122-167) but is
    DROPPED from grad wrt the features. ``full_grad=True`` adds those
    dropped terms — what jax autodiff (and our fused VJP) computes.

    ``ref_adam_schedule=True`` replicates optimizer.cpp:33-34 advancing
    b1_t/b2_t per update() CALL, with the reference's optimizer-instance
    layout: one shared adam for the W_neigh's (net.cpp:230-234), one
    adam per aggregator for (alpha_l, alpha_r) (gat_aggregator.cpp:202),
    and the dense layer's own adam applied DURING backward
    (dense_layer.cpp:backward). False = one power step per epoch for
    every tensor (our Adam)."""

    def __init__(self, g, dims, params, lr, begin, end, labels, mask,
                 *, full_grad, ref_adam_schedule, eps_slope=0.2):
        self.g = g
        self.src, self.dst = g.coo()
        self.dims = dims
        self.W = [np.asarray(p["W_neigh"], np.float64).copy()
                  for p in params["gconv"]]
        self.al = [np.asarray(p["alpha_l"], np.float64).copy()
                   for p in params["gconv"]]
        self.ar = [np.asarray(p["alpha_r"], np.float64).copy()
                   for p in params["gconv"]]
        self.Wd = np.asarray(params["dense"]["W"], np.float64).copy()
        self.opt_shared = AdamNp(lr)
        self.opt_alpha = [AdamNp(lr) for _ in dims]
        self.opt_dense = AdamNp(lr)
        self.full_grad = full_grad
        self.ref_sched = ref_adam_schedule
        self.eps = eps_slope
        self.begin, self.end = begin, end
        self.labels, self.mask = labels, mask

    def _adam(self, opt, name, dW, W):
        opt.update(name, dW, W)
        if self.ref_sched:
            opt.end_step()   # per-CALL power advance (optimizer.cpp:33)

    def _row_softmax(self, scores):
        out = np.zeros_like(scores)
        rp = self.g.row_ptr
        for i in range(self.g.nv):
            b, e = rp[i], rp[i + 1]
            if e > b:
                out[b:e] = softmax_np(scores[b:e])
        return out

    def forward(self, x):
        h = x.astype(np.float64)
        self.layer_in, self.t, self.temp, self.norm, self.acts = [], [], [], [], []
        for l, (_din, _dout, act) in enumerate(self.dims):
            self.layer_in.append(h)
            t = h @ self.W[l]
            sl, sr = t @ self.al[l], t @ self.ar[l]
            temp = sl[self.src] + sr[self.dst]
            scores = np.where(temp > 0, temp, self.eps * temp)
            norm = self._row_softmax(scores)
            out = np.zeros_like(t)
            np.add.at(out, self.src, norm[:, None] * t[self.dst])
            if act:
                out = np.maximum(out, 0.0)
            self.t.append(t), self.temp.append(temp), self.norm.append(norm)
            self.acts.append(out)
            h = out
        # l2norm (l2norm_layer.cpp:19-38) + dense head
        s = np.maximum((h * h).sum(1, keepdims=True), 1e-12)
        self.h_pre_norm, self.h_norm = h, h / np.sqrt(s)
        return self.h_norm @ self.Wd

    def _backward(self, g_logits):
        # dense (updates its weight DURING backward, dense_layer.cpp)
        Wd_grad = self.h_norm.T @ g_logits
        g = g_logits @ self.Wd.T
        self._adam(self.opt_dense, "Wd", Wd_grad, self.Wd)
        # l2norm exact vjp (l2norm_layer.cpp:40-66)
        x = self.h_pre_norm
        s = np.maximum((x * x).sum(1, keepdims=True), 1e-12)
        g = (g - (g * x).sum(1, keepdims=True) * x / s) / np.sqrt(s)
        W_grads, al_grads, ar_grads = [], [], []
        for l in reversed(range(len(self.dims))):
            _din, _dout, act = self.dims[l]
            if act:
                g = np.where(self.acts[l] > 0, g, 0.0)
            t, norm, temp = self.t[l], self.norm[l], self.temp[l]
            # score adjoint (d_softmax) + leaky'
            nsg = (g[self.src] * t[self.dst]).sum(1)
            row_dot = np.zeros(self.g.nv)
            np.add.at(row_dot, self.src, norm * nsg)
            s_hat = norm * (nsg - row_dot[self.src])
            tsg = s_hat * np.where(temp > 0, 1.0, self.eps)
            ar_g = (tsg[:, None] * t[self.dst]).sum(0)
            row_tsg = np.zeros(self.g.nv)
            np.add.at(row_tsg, self.src, tsg)
            al_g = (row_tsg[:, None] * t).sum(0)
            # value path through the transposed scores (update_all :199)
            g_t = np.zeros_like(t)
            np.add.at(g_t, self.dst, norm[:, None] * g[self.src])
            if self.full_grad:
                # the paths gat_aggregator.cpp drops: scores depend on t
                np.add.at(g_t, self.dst, tsg[:, None] * self.ar[l][None, :])
                g_t += row_tsg[:, None] * self.al[l][None, :]
            W_grads.insert(0, self.layer_in[l].T @ g_t)
            al_grads.insert(0, al_g), ar_grads.insert(0, ar_g)
            if l > 0:
                g = g_t @ self.W[l].T
        # update_weights order (net.cpp:230-234 + gat_layer update_weight)
        for l in range(len(self.dims)):
            self._adam(self.opt_shared, f"W{l}", W_grads[l], self.W[l])
            self._adam(self.opt_alpha[l], "al", al_grads[l], self.al[l])
            self._adam(self.opt_alpha[l], "ar", ar_grads[l], self.ar[l])

    def loss_and_grad(self, logits):
        nv, ncls = logits.shape
        ce = np.zeros(nv)
        grad = np.zeros_like(logits)
        denom = self.end - self.begin
        count = 0
        for i in range(self.begin, self.end):
            if self.mask[i]:
                p = softmax_np(logits[i])
                onehot = np.zeros(ncls)
                onehot[self.labels[i]] = 1.0
                ce[i] = -np.sum(onehot * np.log(np.where(p == 0, 1e-10, p)))
                grad[i] = (p - onehot) / denom
                count += 1
        return ce.sum() / count, grad

    def step(self, x):
        logits = self.forward(x)
        loss, grad = self.loss_and_grad(logits)
        self._backward(grad)
        if not self.ref_sched:   # one power advance per STEP per instance
            for opt in [self.opt_shared, self.opt_dense, *self.opt_alpha]:
                opt.end_step()
        return loss, logits

    def accuracy(self, x, begin, end, mask, labels):
        logits = self.forward(x)
        pred = logits.argmax(1)
        sel = np.zeros(len(pred), bool)
        sel[begin:end] = True
        sel &= np.asarray(mask) != 0
        return float((pred[sel] == labels[sel]).mean())
