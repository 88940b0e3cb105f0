"""Scalar / numpy kernels shared by operators and tests.

geometry — rect/poly IoU (incl. concave/self-intersecting via even-odd
           decomposition), NMS, table adjacency/clique logic
text     — charsets, CTC/attention decode (pure-python oracle + numpy batch)
html     — table html assembly (area_to_html / format_html parity)
png/jpeg — pure stdlib/numpy image codecs (RFC 2083; ITU-T T.81 baseline)
beam     — CTC prefix beam search + lexicon-trie fusion
trees    — ZSS tree edit distance, TEDS, tree-F1
"""
