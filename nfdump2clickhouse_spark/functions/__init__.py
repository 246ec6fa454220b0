"""Column-function libraries: IPv4/CIDR arithmetic, text analysis,
similarity/dedup helpers. All pure Column expressions (JVM-side,
whole-stage-codegen) unless a docstring says otherwise."""
