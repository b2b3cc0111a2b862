"""Attention kernels: paged-KV MLA/GQA decode, sinks attention, MLA preprocess."""
