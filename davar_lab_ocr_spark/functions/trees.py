"""Tree metrics: tree edit distance (Zhang-Shasha), TEDS, CTUNet tree-F1.

Re-expressions of the reference's table metrics without the apted/lxml
dependencies (not in this environment):

- TEDS (davarocr/davar_table/utils/metric.py:41-163): parse table html
  into (tag, colspan, rowspan, content) nodes; edit distance with
  insert/delete cost 1 and rename cost 1 when tag/colspan/rowspan
  differ else normalized levenshtein of td content; score =
  1 - dist / max(n_nodes_pred, n_nodes_gt) (node counts EXCLUDE the
  table root, mirroring xpath('.//*')).
- tree-F1 (davarocr/davar_table/core/evaluation/tree_f1_score.py:18-265):
  decode the relations adjacency matrix into key-value trees (roots =
  in-degree 0 / out-degree > 0; label 1 edges = top children, label 2 =
  left children; subtree expansion breadth-queue over nonzero edges),
  then hard (exact tree membership) or soft (per-root TED similarity)
  precision/recall/F1.

The tree edit distance itself is the classic Zhang-Shasha ordered-tree
algorithm (public knowledge); apted computes the same quantity.
"""

from __future__ import annotations

import numpy as np


class Node:
    __slots__ = ("label", "children", "colspan", "rowspan", "content")

    def __init__(self, label, children=None, colspan=None, rowspan=None, content=None):
        self.label = label
        self.children = children or []
        self.colspan = colspan
        self.rowspan = rowspan
        self.content = content  # list of chars for td nodes

    def size(self) -> int:
        return 1 + sum(c.size() for c in self.children)


def _postorder(root: Node):
    """Return (nodes in postorder, leftmost-leaf index per node)."""
    nodes, lmld = [], []

    def walk(n):
        first = None
        for c in n.children:
            f = walk(c)
            if first is None:
                first = f
        nodes.append(n)
        idx = len(nodes) - 1
        lmld.append(idx if first is None else first)
        return lmld[idx]

    walk(root)
    return nodes, lmld


def _levenshtein_seq(a, b) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def default_rename(n1: Node, n2: Node) -> float:
    return 0.0 if n1.label == n2.label else 1.0


def teds_rename(n1: Node, n2: Node) -> float:
    """CustomConfig.rename (metric.py:53-60)."""
    if n1.label != n2.label or n1.colspan != n2.colspan or n1.rowspan != n2.rowspan:
        return 1.0
    if n1.label == "td":
        c1 = n1.content or []
        c2 = n2.content or []
        if c1 or c2:
            return _levenshtein_seq(c1, c2) / max(len(c1), len(c2))
    return 0.0


def tree_edit_distance(t1: Node, t2: Node, rename=default_rename) -> float:
    """Zhang-Shasha ordered tree edit distance (insert/delete cost 1)."""
    nodes1, l1 = _postorder(t1)
    nodes2, l2 = _postorder(t2)
    n, m = len(nodes1), len(nodes2)
    kr1 = _keyroots(l1)
    kr2 = _keyroots(l2)
    td = np.zeros((n, m))

    for i in kr1:
        for j in kr2:
            _treedist(i, j, nodes1, nodes2, l1, l2, td, rename)
    return float(td[n - 1, m - 1])


def _keyroots(lml):
    seen = set()
    out = []
    for i in range(len(lml) - 1, -1, -1):
        if lml[i] not in seen:
            out.append(i)
            seen.add(lml[i])
    return sorted(out)


def _treedist(i, j, nodes1, nodes2, l1, l2, td, rename):
    li, lj = l1[i], l2[j]
    fd = np.zeros((i - li + 2, j - lj + 2))
    for x in range(1, i - li + 2):
        fd[x, 0] = fd[x - 1, 0] + 1
    for y in range(1, j - lj + 2):
        fd[0, y] = fd[0, y - 1] + 1
    for x in range(1, i - li + 2):
        for y in range(1, j - lj + 2):
            ni, nj = li + x - 1, lj + y - 1
            if l1[ni] == li and l2[nj] == lj:
                fd[x, y] = min(
                    fd[x - 1, y] + 1,
                    fd[x, y - 1] + 1,
                    fd[x - 1, y - 1] + rename(nodes1[ni], nodes2[nj]),
                )
                td[ni, nj] = fd[x, y]
            else:
                fd[x, y] = min(
                    fd[x - 1, y] + 1,
                    fd[x, y - 1] + 1,
                    fd[l1[ni] - li, l2[nj] - lj] + td[ni, nj],
                )


# ---------------------------------------------------------------------------
# table html -> tree (restricted to the html our engine emits)
# ---------------------------------------------------------------------------
import re

_TOKEN_RE = re.compile(r"<(/?)(\w+)((?:\s+[\w-]+=\"[^\"]*\")*)\s*(/?)>|([^<]+)")
_ATTR_RE = re.compile(r"([\w-]+)=\"([^\"]*)\"")
_STRUCTURAL = {"table", "thead", "tbody", "tr", "td"}


def parse_table_html(html_str: str, structure_only: bool = False) -> Node | None:
    """Parse '<html><body><table>...</table></body></html>' into a
    TEDS node tree rooted at <table>.

    Structural tags (table/thead/tbody/tr/td) become tree nodes; any
    OTHER tag inside a td (PubTabNet cells carry <b>/<i>/<sup>/<sub>
    inline markup) becomes a single '<tag>' / '</tag>' token in the
    cell content, exactly like the reference's TEDS.tokenize which
    appends '<%s>' % node.tag around the recursion (metric.py:73-84) —
    so inline markup differences cost content-levenshtein edits, not
    tree edits. Self-closing '<br/>' emits both tokens, matching
    lxml's empty-element node. HTML entity decoding is out of scope
    (fixture html is entity-free)."""
    m = re.search(r"<table[^>]*>(.*)</table>", html_str, re.S)
    if m is None:
        return None
    body = m.group(0)
    root = None
    stack: list[Node] = []
    for tok in _TOKEN_RE.finditer(body):
        closing, tag, attrs, selfclose, text = (
            tok.group(1), tok.group(2), tok.group(3), tok.group(4), tok.group(5),
        )
        if text is not None:
            if stack and stack[-1].label == "td" and not structure_only:
                stack[-1].content.extend(list(text))
            continue
        if tag not in _STRUCTURAL:
            # inline markup token(s) inside a cell
            if stack and stack[-1].label == "td" and not structure_only:
                if closing:
                    stack[-1].content.append(f"</{tag}>")
                else:
                    stack[-1].content.append(f"<{tag}>")
                    if selfclose:
                        stack[-1].content.append(f"</{tag}>")
            continue
        if not closing:
            attrib = dict(_ATTR_RE.findall(attrs or ""))
            if tag == "td":
                node = Node(
                    "td",
                    colspan=int(attrib.get("colspan", "1")),
                    rowspan=int(attrib.get("rowspan", "1")),
                    content=[],
                )
            else:
                node = Node(tag)
            if stack:
                stack[-1].children.append(node)
            else:
                root = node
            stack.append(node)
        else:
            stack.pop()
    return root


def teds_score(pred_html: str, gt_html: str, structure_only: bool = False) -> float:
    """TEDS score between two table htmls (metric.py:111-134)."""
    if not pred_html or not gt_html:
        return 0.0
    tp = parse_table_html(pred_html, structure_only)
    tg = parse_table_html(gt_html, structure_only)
    if tp is None or tg is None:
        return 0.0
    n_nodes = max(tp.size() - 1, tg.size() - 1)  # exclude <table> root
    if n_nodes <= 0:
        return 1.0
    dist = tree_edit_distance(tp, tg, rename=teds_rename)
    return 1.0 - dist / n_nodes


# ---------------------------------------------------------------------------
# CTUNet relations matrix -> key-value trees -> tree F1
# ---------------------------------------------------------------------------
def adjacency_to_trees(adj, leftlabel: int = 2, rightlabel: int = 1) -> list[dict]:
    """tree_f1_score.ajacent_to_tree semantics (:54-120)."""
    a = np.asarray(adj)
    n = len(a)
    roots = [i for i in range(n) if a[:, i].sum() == 0 and a[i, :].sum()]
    trees = []
    for root in roots:
        top, left = [], []
        for node in range(n):
            if a[root][node] == leftlabel:
                left.append(node)
            elif a[root][node] == rightlabel:
                top.append(node)
        trees.append(
            {
                "idx": root,
                "top": [_child_tree(a, v) for v in top],
                "left": [_child_tree(a, v) for v in left],
            }
        )
    return trees


def _child_tree(a, node) -> dict:
    from collections import deque

    tree = {"idx": node}
    que = deque([tree])
    vis = [False] * len(a)
    while que:
        for _ in range(len(que)):
            u_dict = que.pop()
            u = u_dict["idx"]
            vis[u] = True
            children = []
            for v in range(len(a)):
                if vis[v] or a[u][v] == 0:
                    continue
                v_dict = {"idx": v}
                que.append(v_dict)
                children.append(v_dict)
            u_dict["children"] = children
    return tree


def _kv_tree_to_node(tree: dict) -> Node:
    """Convert the dict tree into labeled Nodes matching cvt_tree2str's
    labeling (root idx; 'top<idx>' / 'left<idx>' branch nodes)."""

    def sub(d):
        return Node(str(d["idx"]), [sub(c) for c in d.get("children", [])])

    root = Node(str(tree["idx"]))
    for t in tree["top"]:
        root.children.append(Node(f"top{t['idx']}", [sub(c) for c in t.get("children", [])]))
    for l in tree["left"]:
        root.children.append(Node(f"left{l['idx']}", [sub(c) for c in l.get("children", [])]))
    return root


def _kv_teds(tree_gt: dict, tree_pred: dict) -> float:
    ng = _kv_tree_to_node(tree_gt)
    npr = _kv_tree_to_node(tree_pred)
    len_gt = ng.size()
    dist = tree_edit_distance(ng, npr, rename=default_rename)
    teds = 1 - dist / (len_gt - 1) if len_gt > 1 else (1.0 if dist == 0 else 0.0)
    return max(teds, 0.0)


def tree_f1(gt_adj, pred_adj, eval_type: str = "hard") -> tuple[float, float, float]:
    """(recall, precision, f1) for one table (cal_tree_f1_score)."""
    gt = adjacency_to_trees(gt_adj)
    pred = adjacency_to_trees(pred_adj)
    if len(pred) == 0 and len(gt):
        return 1.0, 0.0, 0.0
    if len(pred) and len(gt) == 0:
        return 0.0, 1.0, 0.0
    if len(pred) == 0 and len(gt) == 0:
        return 1.0, 1.0, 1.0
    if eval_type == "hard":
        r = sum(1 for g in gt if g in pred) / len(gt)
        p = sum(1 for q in pred if q in gt) / len(pred)
    elif eval_type == "soft":
        r = sum(
            next((_kv_teds(g, q) for q in pred if q["idx"] == g["idx"]), 0.0) for g in gt
        ) / len(gt)
        p = sum(
            next((_kv_teds(g, q) for g in gt if g["idx"] == q["idx"]), 0.0) for q in pred
        ) / len(pred)
    else:
        raise ValueError("eval_type must be hard or soft")
    f1 = 2 * r * p / (r + p) if p and r else 0.0
    return r, p, f1
