"""TPU-native model zoo: Qwen2/Llama LLMs, SigLIP vision towers, projectors."""
