"""Circuit model layer: R1CS constraint systems and circuit generators."""
