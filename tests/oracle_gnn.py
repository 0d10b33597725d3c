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
