#!/bin/sh
#
# unsloth_tpu installer — sets up a venv with the package and its JAX/TPU
# stack, builds the native quantizer, and optionally launches the Studio.
#
# Usage:  ./install.sh [--cpu] [--home DIR] [--no-studio]
#         curl -fsSL <url>/install.sh | UNSLOTH_TPU_CPU=1 sh
#
# Reference parity: install.sh/install.ps1 (the reference ships shell +
# PowerShell installers for its Studio; this environment is POSIX-only).
# Env vars (for piped installs, where flags are awkward):
#   UNSLOTH_TPU_HOME   install dir   (default $HOME/.unsloth_tpu)
#   UNSLOTH_TPU_CPU=1  install jax[cpu] instead of jax[tpu]
#   UNSLOTH_TPU_NO_STUDIO=1  skip the launch prompt
set -e

_unsloth_tpu_main() {

HOME_DIR="${UNSLOTH_TPU_HOME:-$HOME/.unsloth_tpu}"
WANT_CPU="${UNSLOTH_TPU_CPU:-0}"
NO_STUDIO="${UNSLOTH_TPU_NO_STUDIO:-0}"
while [ $# -gt 0 ]; do
    case "$1" in
        --cpu) WANT_CPU=1 ;;
        --home) shift; HOME_DIR="$1" ;;
        --no-studio) NO_STUDIO=1 ;;
        *) echo "unknown option: $1" >&2; exit 2 ;;
    esac
    shift
done

say() { printf '\033[1;36m==>\033[0m %s\n' "$*"; }
die() { printf '\033[1;31merror:\033[0m %s\n' "$*" >&2; exit 1; }

PY="$(command -v python3 || command -v python || true)"
[ -n "$PY" ] || die "python3 not found; install Python >= 3.10 first"
"$PY" -c 'import sys; sys.exit(0 if sys.version_info >= (3, 10) else 1)' \
    || die "Python >= 3.10 required"

SRC_DIR="$(CDPATH= cd -- "$(dirname -- "$0")" && pwd)"
[ -f "$SRC_DIR/pyproject.toml" ] || die "run from the repo checkout"

say "installing into $HOME_DIR"
mkdir -p "$HOME_DIR"
if [ ! -d "$HOME_DIR/venv" ]; then
    "$PY" -m venv "$HOME_DIR/venv"
fi
VPY="$HOME_DIR/venv/bin/python"
"$VPY" -m pip install --quiet --upgrade pip

if [ "$WANT_CPU" = "1" ]; then
    say "installing JAX (CPU)"
    "$VPY" -m pip install --quiet "jax"
else
    say "installing JAX (TPU)"
    "$VPY" -m pip install --quiet "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        || { say "TPU wheels unavailable; falling back to CPU JAX"; \
             "$VPY" -m pip install --quiet "jax"; }
fi

say "installing unsloth_tpu"
"$VPY" -m pip install --quiet -e "$SRC_DIR"

if command -v g++ >/dev/null 2>&1; then
    say "building native GGUF quantizer"
    g++ -O3 -shared -fPIC -o "$SRC_DIR/csrc/libgguf_quant.so" \
        "$SRC_DIR/csrc/gguf_quant.cpp" || say "native build failed; the \
numpy fallback covers q8_0/q4_0 (K-quants need the native lib)"
else
    say "g++ not found — K-quant GGUF export needs it (q8_0/q4_0 work)"
fi

say "smoke test"
"$VPY" - <<'EOF'
import unsloth_tpu
import jax
print("  unsloth_tpu ok;", jax.default_backend(), "backend,",
      len(jax.devices()), "device(s)")
EOF

BIN="$HOME_DIR/bin"
mkdir -p "$BIN"
cat > "$BIN/unsloth-tpu" <<LAUNCH
#!/bin/sh
exec "$VPY" -m unsloth_tpu.cli "\$@"
LAUNCH
chmod +x "$BIN/unsloth-tpu"
say "CLI at $BIN/unsloth-tpu (add $BIN to PATH)"

if [ "$NO_STUDIO" != "1" ] && [ -t 0 ]; then
    printf 'launch the Studio now? [y/N] '
    read -r ans || ans=n
    case "$ans" in
        y|Y) exec "$VPY" -m unsloth_tpu.cli studio ;;
    esac
fi
say "done. Start the Studio with: unsloth-tpu studio"

}
_unsloth_tpu_main "$@"
