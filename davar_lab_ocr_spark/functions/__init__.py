"""Scalar / numpy kernels shared by operators and tests.

geometry — rect IoU, NMS, table adjacency/clique logic
text     — charsets, CTC/attention decode (pure-python oracle + numpy batch)
html     — table html assembly (area_to_html / format_html parity)
"""
