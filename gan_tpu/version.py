"""Environment probe — the reference's units/version.py (C10) analog."""

import jax
import jaxlib


def env_report() -> str:
    lines = [
        f"jax {jax.__version__}",
        f"jaxlib {jaxlib.__version__}",
        f"devices {[str(d) for d in jax.devices()]}",
        f"default backend {jax.default_backend()}",
    ]
    try:
        import flax, optax, orbax.checkpoint  # noqa

        lines.append(f"flax {flax.__version__} optax {optax.__version__}")
    except ImportError:
        pass
    return "\n".join(lines)


if __name__ == "__main__":
    print(env_report())
