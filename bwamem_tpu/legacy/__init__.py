"""Legacy short-read aligner (`aln` / `samse` / `sampe`) — the bounded-diff
backtracking search family the reference exposes next to `mem`
(main.c:111-113)."""
