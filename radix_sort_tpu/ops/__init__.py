"""Operator set: sort (centerpiece), ranking, partition, filter, aggregate,
join — the TPU-native generalization of the reference's four kernels."""
