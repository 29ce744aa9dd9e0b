#pragma once
#ifndef BOOST_FOREACH
#define BOOST_FOREACH(decl, col) for (decl : col)
#endif
