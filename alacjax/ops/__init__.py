"""Device ops — batched JAX/Pallas implementations of the codec stages.

Layout convention: arrays are (B, S) = (frames-in-batch, samples-per-frame)
per channel.  All per-frame sequential recurrences (predictor adaptation,
Rice parameter EMA) run as scans over S vectorized across B; the bit-serial
Rice bitstream is reformulated as token emission + prefix-sum + word
scatter (SURVEY.md §5 long-context row, §7 architecture).
"""
