"""Input/output: FASTA/FASTQ parsing and batching."""
