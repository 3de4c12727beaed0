// Empty stand-in: the vendored NVIDIA SDK timer is not needed by the
// reference codec functions compiled as the host-only test oracle.
#pragma once
