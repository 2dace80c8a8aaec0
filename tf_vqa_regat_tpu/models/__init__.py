"""Model families: language encoder, relation encoders (implicit / spatial /
semantic), fusion heads (BUTD / BAN / MuTAN), classifier, and the full ReGAT
network."""
