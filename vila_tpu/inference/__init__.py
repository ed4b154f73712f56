"""Inference engine: bucketed prefill, chunked KV-cache decode, sampling."""
