#pragma once
#include <cassert>
#ifndef BOOST_ASSERT
#define BOOST_ASSERT(x) assert(x)
#endif
#ifndef BOOST_VERIFY
#define BOOST_VERIFY(x) ((void)(x))
#endif
