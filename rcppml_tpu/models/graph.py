"""FactorNet graph engine — composable multi-layer factorization DAGs.

TPU equivalent of ``inst/include/FactorNet/graph/`` and the R front-end
``R/factor_net.R:42-508``.  Node types (graph/node.hpp:47-56): INPUT,
NMF_LAYER, SVD_LAYER, SHARED, CONCAT, ADD, CONDITION.

Execution (graph/fit.hpp):
  * single layer -> delegate to the full NMF engine (sharded/IRLS/CV all
    available);
  * multi-layer -> outer ALS (fit.hpp:265-355): warmup fits per layer, then
    per-layer single-iteration sweeps warm-started from the current W, until
    the summed per-layer reconstruction loss converges;
  * SHARED multi-modal inputs are row-concatenated before fitting and W is
    split back into per-input row blocks (R/factor_methods.R:152-221);
  * deeper layers factorize t(H) of their upstream layer
    (fit.hpp:95-175); CONCAT row-binds branch t(H)s, ADD sums branch Hs,
    CONDITION appends covariate columns.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..config import FactorConfig
from ..result import NMFResult

_counter = itertools.count()


class Node:
    kind = "node"

    def __init__(self, name: Optional[str] = None):
        self.name = name or f"{self.kind}_{next(_counter)}"


class Input(Node):
    kind = "input"

    def __init__(self, data, name: Optional[str] = None):
        super().__init__(name)
        self.data = data


class Shared(Node):
    """Shared-H multi-modal input: row-concat of 2+ inputs with the same
    number of columns (samples)."""
    kind = "shared"

    def __init__(self, *inputs: Input, name=None):
        super().__init__(name)
        if len(inputs) < 2:
            raise ValueError("factor_shared requires at least 2 inputs")
        self.inputs = list(inputs)


class Concat(Node):
    kind = "concat"

    def __init__(self, *inputs: Node, name=None):
        super().__init__(name)
        if len(inputs) < 2:
            raise ValueError("factor_concat requires at least 2 inputs")
        self.inputs = list(inputs)


class Add(Node):
    kind = "add"

    def __init__(self, *inputs: Node, name=None):
        super().__init__(name)
        if len(inputs) < 2:
            raise ValueError("factor_add requires at least 2 inputs")
        self.inputs = list(inputs)


class Condition(Node):
    """Append covariate columns Z to the layer input (batch conditioning)."""
    kind = "condition"

    def __init__(self, input: Node, Z, name=None):
        super().__init__(name)
        self.input = input
        self.Z = np.asarray(Z, dtype=np.float32)


class NMFLayer(Node):
    kind = "nmf_layer"

    def __init__(self, input: Node, k: int, *, name=None, W: Optional[dict] = None,
                 H: Optional[dict] = None, loss: str = "mse", **fit_kwargs):
        super().__init__(name)
        self.input = input
        self.k = int(k)
        self.W = W or {}
        self.H = H or {}
        self.loss = loss
        self.fit_kwargs = fit_kwargs


class SVDLayer(Node):
    kind = "svd_layer"

    def __init__(self, input: Node, k: int, *, name=None, **fit_kwargs):
        super().__init__(name)
        self.input = input
        self.k = int(k)
        self.fit_kwargs = fit_kwargs


# R-style constructor aliases (R/factor_net.R:42-508)
factor_input = Input
factor_shared = Shared
factor_concat = Concat
factor_add = Add
factor_condition = Condition
nmf_layer = NMFLayer
svd_layer = SVDLayer


@dataclass
class LayerResult:
    W: np.ndarray
    d: np.ndarray
    H: np.ndarray
    iterations: int = 0
    loss: float = float("nan")
    converged: bool = False
    W_blocks: Optional[Dict[str, np.ndarray]] = None   # shared inputs: split W


@dataclass
class GraphResult:
    layers: Dict[str, LayerResult] = field(default_factory=dict)
    total_iterations: int = 0
    total_loss: float = float("nan")
    converged: bool = False

    def __getitem__(self, name):
        return self.layers[name]


class FactorNet:
    """Compiled factorization graph (graph/graph.hpp:115)."""

    def __init__(self, inputs: Sequence[Input], output: Node, *,
                 maxit: int = 100, tol: float = 1e-4, seed: int = 0,
                 verbose: bool = False):
        self.inputs = list(inputs)
        self.output = output
        self.maxit = maxit
        self.tol = tol
        self.seed = seed
        self.verbose = verbose
        self._layers: List[Node] = []
        self._compiled = False

    # -- topology ----------------------------------------------------------
    def compile(self) -> "FactorNet":
        """Topological collection + validation of layer nodes."""
        seen = set()
        order: List[Node] = []

        def visit(node: Node):
            if id(node) in seen:
                return
            seen.add(id(node))
            if isinstance(node, (NMFLayer, SVDLayer)):
                visit(node.input)
                order.append(node)
            elif isinstance(node, Condition):
                visit(node.input)
            elif isinstance(node, (Concat, Add, Shared)):
                for branch in node.inputs:
                    visit(branch)
            elif isinstance(node, Input):
                pass
            else:
                raise TypeError(f"unknown node type {type(node)}")

        visit(self.output)
        if not order:
            raise ValueError("graph contains no factorization layers")
        names = [l.name for l in order]
        if len(set(names)) != len(names):
            raise ValueError("layer names must be unique")
        self._layers = order
        self._compiled = True
        return self

    @property
    def n_layers(self) -> int:
        return len(self._layers)

    # -- data resolution ---------------------------------------------------

    def _resolve_source(self, node: Node):
        """Walk conditions to the data-bearing node; return (source, Z_list)."""
        zs = []
        while isinstance(node, Condition):
            zs.append(node.Z)
            node = node.input
        return node, zs

    def _input_matrix(self, node: Node):
        """Materialize the dense data for an INPUT / SHARED source node.

        Returns (matrix, row_blocks) where row_blocks maps input names to
        row slices for shared multi-modal splits."""
        if isinstance(node, Input):
            d = node.data
            if hasattr(d, "todense"):
                d = np.asarray(d.todense())
            return np.asarray(d, dtype=np.float32), None
        if isinstance(node, Shared):
            mats = []
            blocks = {}
            row = 0
            ncols = None
            for inp in node.inputs:
                d = inp.data
                if hasattr(d, "todense"):
                    d = np.asarray(d.todense())
                d = np.asarray(d, dtype=np.float32)
                if ncols is None:
                    ncols = d.shape[1]
                elif d.shape[1] != ncols:
                    raise ValueError("shared inputs must have equal columns")
                blocks[inp.name] = slice(row, row + d.shape[0])
                row += d.shape[0]
                mats.append(d)
            return np.vstack(mats), blocks
        raise TypeError(f"cannot materialize data from {type(node)}")

    # -- fitting -----------------------------------------------------------

    def _fit_layer(self, layer: Node, data: np.ndarray, *, maxit, w_init=None,
                   tol=None, seed=None, sort_model=False) -> NMFResult:
        from ..api import nmf as nmf_api
        kw = dict(layer.fit_kwargs)
        if isinstance(layer, SVDLayer):
            # SVD layers run the same outer-ALS machinery without the
            # nonnegativity constraint (graph/fit.hpp handles both layer
            # kinds through the NMF engine)
            kw.setdefault("nonneg", (False, False))
        if isinstance(layer, NMFLayer):
            for side, fc in (("W", layer.W), ("H", layer.H)):
                for key, val in fc.items():
                    arr = kw.setdefault(key, [0.0, 0.0] if key != "nonneg"
                                        else [True, True])
                    if np.isscalar(arr):
                        arr = [arr, arr]
                        kw[key] = arr
                    arr[0 if side == "W" else 1] = val
            kw.setdefault("loss", layer.loss)
        kw["maxit"] = maxit
        if tol is not None:
            kw["tol"] = tol
        kw.setdefault("seed", self.seed if seed is None else seed)
        kw["sort_model"] = sort_model
        return nmf_api(data, layer.k, w_init=w_init, **kw)

    def _effective_input(self, i: int, states: List[LayerResult],
                         data_map) -> np.ndarray:
        """graph/fit.hpp:95-185."""
        layer = self._layers[i]
        node, zs = self._resolve_source(layer.input)
        idx_of = {id(l): j for j, l in enumerate(self._layers)}

        if isinstance(node, (Input, Shared)):
            result = data_map[id(node)][0]
        elif isinstance(node, Concat):
            parts = []
            for branch in node.inputs:
                b, _ = self._resolve_source(branch)
                j = idx_of.get(id(b))
                if j is None:
                    raise ValueError("concat branch is not a layer")
                parts.append(states[j].H.T)
            result = np.hstack(parts)
        elif isinstance(node, Add):
            total = None
            for branch in node.inputs:
                b, _ = self._resolve_source(branch)
                j = idx_of.get(id(b))
                h = states[j].H
                total = h if total is None else total + h
            result = total.T
        elif isinstance(node, (NMFLayer, SVDLayer)):
            j = idx_of[id(node)]
            result = states[j].H.T                       # n x k_prev
        else:
            raise TypeError(f"bad input node {type(node)}")

        for Z in reversed(zs):
            n = result.shape[0]
            Zo = Z if Z.shape[0] == n else Z.T
            if Zo.shape[0] != n:
                raise ValueError("conditioning Z dimension mismatch")
            result = np.hstack([result, Zo.astype(np.float32)])
        return result

    def fit(self) -> GraphResult:
        if not self._compiled:
            self.compile()

        # materialize data-bearing nodes once
        data_map = {}
        for layer in self._layers:
            node, _ = self._resolve_source(layer.input)
            if isinstance(node, (Input, Shared)) and id(node) not in data_map:
                data_map[id(node)] = self._input_matrix(node)

        if self.n_layers == 1:
            layer = self._layers[0]
            node, _ = self._resolve_source(layer.input)
            data, blocks = data_map[id(node)]
            data = self._effective_input(0, [], data_map) \
                if not isinstance(node, (Input, Shared)) else data
            res = self._fit_layer(layer, data, maxit=self.maxit, tol=self.tol,
                                  sort_model=True)
            lr = LayerResult(W=res.W, d=res.d, H=res.H,
                             iterations=res.iterations, loss=res.train_loss,
                             converged=res.converged)
            if blocks:
                lr.W_blocks = {name: res.W[sl] for name, sl in blocks.items()}
            out = GraphResult(layers={layer.name: lr},
                              total_iterations=res.iterations,
                              total_loss=res.train_loss,
                              converged=res.converged)
            return out

        # ---- multi-layer outer ALS (fit.hpp:265-355) ----
        n_layers = self.n_layers
        states: List[LayerResult] = [None] * n_layers       # type: ignore
        init_maxit = min(10, self.maxit)
        seed_base = self.seed if self.seed else 42

        for i, layer in enumerate(self._layers):
            inp = self._effective_input(i, states, data_map)
            res = self._fit_layer(layer, inp, maxit=init_maxit,
                                  seed=seed_base + i)
            states[i] = LayerResult(W=res.W, d=res.d, H=res.H)

        prev_loss = np.inf
        total_iter = 0
        converged = False
        for _outer in range(self.maxit):
            for i, layer in enumerate(self._layers):
                inp = self._effective_input(i, states, data_map)
                res = self._fit_layer(layer, inp, maxit=1, tol=0.0,
                                      w_init=states[i].W,
                                      seed=seed_base + i)
                states[i] = LayerResult(W=res.W, d=res.d, H=res.H)
            total_iter += 1

            cur_loss = 0.0
            for i, layer in enumerate(self._layers):
                inp = self._effective_input(i, states, data_map)
                s = states[i]
                recon = (s.W * s.d[None, :]) @ s.H
                cur_loss += float(np.mean((inp - recon) ** 2))
            if self.verbose:
                print(f"  outer iter {total_iter}: loss = {cur_loss:.6g}")
            if np.isfinite(prev_loss):
                rel = abs(prev_loss - cur_loss) / (abs(prev_loss) + 1e-15)
                if rel < self.tol:
                    converged = True
                    prev_loss = cur_loss
                    break
            prev_loss = cur_loss

        out = GraphResult(total_iterations=total_iter,
                          total_loss=float(prev_loss), converged=converged)
        for i, layer in enumerate(self._layers):
            s = states[i]
            s.iterations = total_iter
            s.loss = float(prev_loss)
            s.converged = converged
            node, _ = self._resolve_source(layer.input)
            if isinstance(node, Shared):
                _, blocks = data_map[id(node)]
                s.W_blocks = {name: s.W[sl] for name, sl in blocks.items()}
            out.layers[layer.name] = s
        return out


def factor_net(inputs, output, *, maxit: int = 100, tol: float = 1e-4,
               seed: int = 0, verbose: bool = False) -> FactorNet:
    """Build (and compile) a FactorNet (R/factor_net.R factor_net())."""
    if isinstance(inputs, Input):
        inputs = [inputs]
    return FactorNet(inputs, output, maxit=maxit, tol=tol, seed=seed,
                     verbose=verbose).compile()


def fit(net: FactorNet) -> GraphResult:
    return net.fit()


def cross_validate_graph(data_list, k_values, *, test_fraction: float = 0.1,
                         cv_seed: int = 0, maxit: int = 50, **layer_kwargs):
    """Grid-search shared-graph hyperparameters with speckled CV
    (R/cross_validate_graph.R:86): for each k, fit the shared multi-modal
    model with a holdout and record the held-out error."""
    from ..api import nmf as nmf_api
    mats = []
    for d in data_list:
        if hasattr(d, "todense"):
            d = np.asarray(d.todense())
        mats.append(np.asarray(d, dtype=np.float32))
    stacked = np.vstack(mats)
    rows = []
    for k in k_values:
        res = nmf_api(stacked, int(k), test_fraction=test_fraction,
                      cv_seed=cv_seed, maxit=maxit, **layer_kwargs)
        rows.append({"k": int(k), "train_mse": res.train_loss,
                     "test_mse": res.test_loss,
                     "best_test_loss": res.misc.get("best_test_loss")})
    return rows


def factor_config(side=None, **kw) -> dict:
    """Per-side factor config builder (R/factor_net.R factor_config/W/H):
    returns the kwargs dict ``nmf_layer`` expects for its ``W=``/``H=``.
    Valid keys: L1, L2, L21, angular, upper_bound, nonneg, graph,
    graph_lambda, target, target_lambda."""
    valid = {"L1", "L2", "L21", "angular", "upper_bound", "nonneg",
             "graph", "graph_lambda", "target", "target_lambda"}
    bad = set(kw) - valid
    if bad:
        raise ValueError(f"unknown factor-config keys {sorted(bad)}; "
                         f"valid: {sorted(valid)}")
    return dict(kw)


def W(**kw) -> dict:
    """R-style W-side config: ``nmf_layer(x, k, W=W(L1=0.1))``."""
    return factor_config("W", **kw)


def H(**kw) -> dict:
    """R-style H-side config: ``nmf_layer(x, k, H=H(L2=0.01))``."""
    return factor_config("H", **kw)
